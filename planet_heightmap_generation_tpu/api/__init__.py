from .planet_code import encode_planet_code, decode_planet_code

__all__ = ["encode_planet_code", "decode_planet_code"]
