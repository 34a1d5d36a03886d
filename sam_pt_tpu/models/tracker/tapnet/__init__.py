from .model import TAPNet
from .tracker import TapNetPointTracker
