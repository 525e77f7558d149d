from .engine import PlanetEngine, PlanetResult

__all__ = ["PlanetEngine", "PlanetResult"]
