"""Extract the power-of-2 decimation FIR coefficient tables from the reference.

The reference ships auto-generated half/quarter-band FIR coefficient tables
("Youssef Touil's optimized plan generation algo",
reference: core/src/dsp/multirate/decim/plans.h:24-141 and decim/taps/*.h).
These are pure numeric data (not code); SURVEY.md directs copying the
coefficient tables verbatim so the decimation output matches the reference
bit-for-bit. This script parses the C headers and emits a .npz data file
consumed by sdrpp_tpu/ops/decim_plans.py.

Usage: python tools/extract_decim_taps.py
"""

import re
from pathlib import Path

import numpy as np

REF = Path("/root/reference/core/src/dsp/multirate/decim/taps")
OUT = Path(__file__).resolve().parent.parent / "sdrpp_tpu" / "ops" / "decim_taps.npz"

# Stage plans per power-of-2 ratio (reference decim/plans.h:37-128):
# ratio -> list of (decimation, tap-table name)
PLANS = {
    2: [(2, "fir_2_2")],
    4: [(2, "fir_4_2"), (2, "fir_2_2")],
    8: [(4, "fir_8_4"), (2, "fir_2_2")],
    16: [(8, "fir_16_8"), (2, "fir_2_2")],
    32: [(8, "fir_32_8"), (2, "fir_4_2"), (2, "fir_2_2")],
    64: [(8, "fir_64_8"), (4, "fir_8_4"), (2, "fir_2_2")],
    128: [(16, "fir_128_16"), (4, "fir_8_4"), (2, "fir_2_2")],
    256: [(32, "fir_256_32"), (4, "fir_8_4"), (2, "fir_2_2")],
    512: [(32, "fir_512_32"), (8, "fir_16_8"), (2, "fir_2_2")],
    1024: [(64, "fir_1024_64"), (8, "fir_16_8"), (2, "fir_2_2")],
    2048: [(64, "fir_2048_64"), (8, "fir_32_8"), (2, "fir_4_2"), (2, "fir_2_2")],
    4096: [(64, "fir_4096_64"), (8, "fir_64_8"), (4, "fir_8_4"), (2, "fir_2_2")],
    8192: [(128, "fir_8192_128"), (8, "fir_64_8"), (4, "fir_8_4"), (2, "fir_2_2")],
}

FLOAT_RE = re.compile(r"[-+]?\d*\.\d+(?:[eE][-+]?\d+)?|[-+]?\d+\.\d*")


def parse_taps(header: Path) -> np.ndarray:
    text = header.read_text()
    body = text[text.index("{") : text.rindex("}")]
    vals = [float(m) for m in FLOAT_RE.findall(body)]
    m = re.search(r"_len\s*=\s*(\d+)", text)
    assert m and len(vals) == int(m.group(1)), (header, len(vals), m)
    return np.asarray(vals, dtype=np.float32)


def main():
    tables = {}
    for hdr in sorted(REF.glob("fir_*.h")):
        tables[hdr.stem] = parse_taps(hdr)
    arrays = dict(tables)
    # Encode plans as structured metadata arrays.
    for ratio, stages in PLANS.items():
        arrays[f"plan_{ratio}_decim"] = np.asarray([d for d, _ in stages], np.int32)
        # Store table names as a '|' joined string in an array of bytes.
        arrays[f"plan_{ratio}_names"] = np.array("|".join(n for _, n in stages))
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT} with {len(tables)} tap tables, {len(PLANS)} plans")


if __name__ == "__main__":
    main()


def extract_dab_phase_sym():
    """Extract the DAB phase-reference symbol table (pure data) from
    decoder_modules/dab_decoder/src/dab_phase_sym.h into dab_phase_sym.npz."""
    import re as _re
    text = Path("/root/reference/decoder_modules/dab_decoder/src/dab_phase_sym.h").read_text()
    pairs = _re.findall(r"\{\s*([-0-9.eE+]+)\s*,\s*([-0-9.eE+]+)\s*\}", text)
    assert len(pairs) == 2048, len(pairs)
    arr = np.array([complex(float(a), float(b)) for a, b in pairs], np.complex64)
    out = Path(__file__).resolve().parent.parent / "sdrpp_tpu" / "ops" / "dab_phase_sym.npz"
    np.savez_compressed(out, prs_conj=arr)
    print(f"wrote {out}")
