from .model import PipsPlusPlus
from .tracker import PipsPlusPlusPointTracker
