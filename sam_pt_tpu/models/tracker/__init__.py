from .api import PointTracker
