"""Point tracker registry (reference sam_pt/point_tracker/__init__.py surface).

All seven tracker families re-exported; construct directly or through the
Hydra-style configs under configs/model/point_tracker/.
"""
from .api import PointTracker
from .cotracker.tracker import CoTrackerPointTracker
from .pips.tracker import PipsPointTracker
from .pips2.tracker import PipsPlusPlusPointTracker
from .raft.tracker import RaftPointTracker
from .superglue.tracker import SuperGluePointTracker
from .tapir.tracker import TapirPointTracker
from .tapnet.tracker import TapNetPointTracker

TRACKER_REGISTRY = {
    "cotracker": CoTrackerPointTracker,
    "pips": PipsPointTracker,
    "pips_plus_plus": PipsPlusPlusPointTracker,
    "raft": RaftPointTracker,
    "superglue": SuperGluePointTracker,
    "tapir": TapirPointTracker,
    "tapnet": TapNetPointTracker,
}
