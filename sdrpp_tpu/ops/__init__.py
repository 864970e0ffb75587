from . import convert, delay, fir, fm, mix, resample, scans, spectrum, taps, windows  # noqa: F401
