from .model import Pips, BasicEncoder
from .tracker import PipsPointTracker
