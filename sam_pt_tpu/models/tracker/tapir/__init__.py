from .model import TAPIR
from .tracker import TapirPointTracker
