#!/usr/bin/env python3
"""Extract format-defining constant tables from the reference headers.

The QLFC bitstream format is defined partly by four constant tables
(coder/common/tables.h): the stretch/squash logit tables (4097 x int16 each)
and two opaque context->state maps (32768 / 8192 x uint8).  These are *data*,
not code: every conforming encoder/decoder must use byte-identical tables.
This tool parses them out of the reference tree once and stores them as .npy
files under libbsc_tpu/coder/tables/, which are committed to the repo so the
build is self-contained.

Usage: python tools/extract_tables.py [/path/to/reference]
"""

import re
import sys
from pathlib import Path

import numpy as np

REF = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
OUT = Path(__file__).resolve().parent.parent / "libbsc_tpu" / "coder" / "tables"
OUT.mkdir(parents=True, exist_ok=True)


def parse_array(src: str, ctype: str, name: str, size: int) -> np.ndarray:
    pat = (
        r"static const "
        + re.escape(ctype)
        + r"\s+"
        + re.escape(name)
        + r"\["
        + str(size)
        + r"\]\s*=\s*\{(.*?)\};"
    )
    m = re.search(pat, src, re.S)
    if not m:
        raise SystemExit(f"table {name} not found")
    vals = [int(x) for x in m.group(1).replace("\n", " ").split(",") if x.strip()]
    assert len(vals) == size, (name, len(vals))
    dtype = {"short": np.int16, "unsigned char": np.uint8}[ctype]
    return np.asarray(vals, dtype=dtype)


def main():
    coder_tables = (REF / "libbsc/coder/common/tables.h").read_text()
    tables = {
        "stretch": parse_array(coder_tables, "short", "bsc_stretch_table", 4097),
        "squash": parse_array(coder_tables, "short", "bsc_squash_table", 4097),
        "rank_state": parse_array(coder_tables, "unsigned char", "model_rank_state_table", 32768),
        "run_state": parse_array(coder_tables, "unsigned char", "model_run_state_table", 8192),
    }
    for name, arr in tables.items():
        np.save(OUT / f"{name}.npy", arr)
        print(f"wrote {name}: {arr.shape} {arr.dtype} sum={int(arr.astype(np.int64).sum())}")


if __name__ == "__main__":
    main()
