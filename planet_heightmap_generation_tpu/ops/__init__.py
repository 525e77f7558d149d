from .rng import ParkMiller, rand_int, pm_sequence, pm_hash01
from .noise import SimplexNoise

__all__ = ["ParkMiller", "rand_int", "pm_sequence", "pm_hash01", "SimplexNoise"]
