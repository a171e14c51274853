from .http import AnalyticsServer

__all__ = ["AnalyticsServer"]
