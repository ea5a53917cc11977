from . import detectors, preprocessing

__all__ = ["detectors", "preprocessing"]
