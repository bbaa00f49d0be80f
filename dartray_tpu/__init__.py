# Global spectral representation switch (Spectrum.type, spectrum.dart:32-58)
from .core.spectrum import set_mode as set_spectrum_mode  # noqa: F401,E402
