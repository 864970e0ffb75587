"""Extract the ATV chrominance band-pass FIR coefficient table (pure data)
from the reference header into sdrpp_tpu/decoders/atv_chroma_taps.npz.

Reference: decoder_modules/atv_decoder/src/chrominance_filter.h — a fixed
231-tap complex FIR isolating the 4.43361875 MHz PAL chroma subcarrier.
Coefficient tables are data, not code (same policy as the decimator plan
taps, tools/extract_decim_taps.py).
"""

import re
import numpy as np

SRC = "/root/reference/decoder_modules/atv_decoder/src/chrominance_filter.h"

pairs = re.findall(r"\{\s*(-?\d+\.\d+),\s*(-?\d+\.\d+)\}", open(SRC).read())
taps = np.array([complex(float(a), float(b)) for a, b in pairs],
                np.complex64)
print(f"{len(taps)} taps")
np.savez("sdrpp_tpu/decoders/atv_chroma_taps.npz", taps=taps)
