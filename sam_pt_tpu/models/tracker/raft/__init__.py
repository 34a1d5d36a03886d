from .model import Raft
from .tracker import RaftPointTracker
