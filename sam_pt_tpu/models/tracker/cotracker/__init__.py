from .model import CoTracker
from .tracker import CoTrackerPointTracker, get_points_on_a_grid
