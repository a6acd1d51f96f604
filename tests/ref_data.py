"""Loader for the reference solver's C test-fixture data.

The reference embeds its problem data as C array literals in test headers
(/root/reference/test/problems/*.h, test/spectral_cones_problems/*.h).
Parity requires running the SAME problems, so this module parses those
arrays out of the (read-only) headers at test time — data only, no code.
"""

from __future__ import annotations

import os
import re

import numpy as np

REF = "/root/reference/test"


def available() -> bool:
    return os.path.isdir(REF)


def load_c_arrays(path: str) -> dict:
    """Parse `scs_float name[] = {...};` / `scs_int name = v;` declarations."""
    text = open(path).read()
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)   # strip comments
    out = {}
    for m in re.finditer(
            r"scs_(float|int)\s+(\w+)\[\]\s*=\s*\{([^;]*)\};", text, re.S):
        kind, name, body = m.groups()
        toks = [t for t in re.split(r"[\s,]+", body.strip()) if t]
        vals = [float(t) for t in toks]
        out[name] = (np.asarray(vals)
                     if kind == "float" else np.asarray(vals, np.int64))
    for m in re.finditer(
            r"scs_(float|int)\s+(\w+)\s*=\s*([-+0-9.eE]+)\s*;", text):
        kind, name, val = m.groups()
        out[name] = float(val) if kind == "float" else int(float(val))
    return out


def csc_to_dense(rows: int, cols: int, x, i, p) -> np.ndarray:
    M = np.zeros((rows, cols))
    for j in range(cols):
        for k in range(int(p[j]), int(p[j + 1])):
            M[int(i[k]), j] = x[k]
    return M


def problem_from_header(path: str):
    """Return (A, P_or_None, b, c, arrays) with A dense (m, n) and P full
    symmetric from the header's upper-tri CSC."""
    arr = load_c_arrays(path)
    m, n = int(arr["m"]), int(arr["n"])
    A = csc_to_dense(m, n, arr["Ax"], arr["Ai"], arr["Ap"])
    P = None
    if "Px" in arr:
        Pu = csc_to_dense(n, n, arr["Px"], arr["Pi"], arr["Pp"])
        P = Pu + Pu.T - np.diag(np.diag(Pu))
    return A, P, arr["b"], arr["c"], arr
