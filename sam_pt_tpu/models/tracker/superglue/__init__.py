from .superpoint import SuperPoint
from .superglue import SuperGlue
from .tracker import SuperGluePointTracker
