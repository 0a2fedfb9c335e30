"""Trusted-setup loading and preprocessing.

Replaces the reference's goroutine-per-point JSON parsing
(reference: trusted_setup.go:90-192) with a host-side decompression pass
plus an on-disk preprocessed-array cache (the checkpoint/resume analog noted
in SURVEY.md §5): the second Context construction is an mmap load, not a
recompute.

Setup points skip subgroup checks (trusted input), matching
trusted_setup.go:102-134.
"""

import hashlib
import json
import os

import numpy as np

from .constants import SCALARS_PER_BLOB
from .golden import curve as gcurve
from .ops.field import fp_spec

_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")
DEFAULT_SETUP_PATH = os.path.abspath(os.path.join(_DATA_DIR, "trusted_setup.json"))
_CACHE_DIR = os.path.abspath(os.path.join(_DATA_DIR, "cache"))
_CACHE_VERSION = 3


def load_trusted_setup_json(path: str = DEFAULT_SETUP_PATH) -> dict:
    with open(path) as f:
        return json.load(f)


def _decompress_g1_batch(hexes):
    pts = []
    for h in hexes:
        if not h.startswith("0x"):
            raise ValueError("hex string is not prefixed with 0x")
        pts.append(gcurve.g1_decompress(bytes.fromhex(h[2:]), subgroup_check=False))
    return pts


def _decompress_g2_batch(hexes):
    pts = []
    for h in hexes:
        if not h.startswith("0x"):
            raise ValueError("hex string is not prefixed with 0x")
        pts.append(gcurve.g2_decompress(bytes.fromhex(h[2:]), subgroup_check=False))
    return pts


def _points_to_arrays(points):
    fp = fp_spec()
    xs = np.stack([fp.from_int(p[0]) if p else np.zeros(fp.n, np.uint32)
                   for p in points])
    ys = np.stack([fp.from_int(p[1]) if p else np.zeros(fp.n, np.uint32)
                   for p in points])
    inf = np.array([p is None for p in points])
    return xs, ys, inf


def check_trusted_setup_is_well_formed(setup: dict):
    """Subgroup-check every point (reference: trusted_setup.go:45-87).

    G1 rides the native batch codec (endomorphism subgroup check); G2 is
    per-point golden (only a handful of points).  Raises DeserializationError
    on any malformed or out-of-subgroup point.
    """
    from . import hostcurve
    g1_bytes = [bytes.fromhex(h[2:])
                for h in list(setup["g1_lagrange"]) + list(setup["g1_monomial"])]
    hostcurve.g1_decompress_many(g1_bytes, subgroup_check=True)
    for h in setup["g2_monomial"]:
        gcurve.g2_decompress(bytes.fromhex(h[2:]), subgroup_check=True)


class ParsedSetup:
    """Host-side numpy arrays of the decompressed setup, ready for device upload.

    Attributes:
      g1_lagrange / g1_monomial: (x, y, inf) limb arrays [4096, 24]
      g2_monomial_ints: list of golden G2 affine tuples (for pairing keys)
      g2_monomial_raw: np.uint8 array of the compressed bytes
    """

    def __init__(self, lag, mono, g2_pts, g2_raw, digest=""):
        self.g1_lagrange = lag
        self.g1_monomial = mono
        self.g2_monomial_ints = g2_pts
        self.g2_monomial_raw = g2_raw
        self.digest = digest


def parse_trusted_setup(setup: dict, cache: bool = True) -> ParsedSetup:
    key_src = json.dumps(
        {k: setup[k] for k in ("g1_monomial", "g1_lagrange", "g2_monomial")},
        sort_keys=True).encode()
    digest = hashlib.sha256(key_src).hexdigest()[:16]
    cache_path = os.path.join(_CACHE_DIR, f"setup_{digest}_v{_CACHE_VERSION}.npz")

    if cache and os.path.exists(cache_path):
        z = np.load(cache_path)
        lag = (z["lag_x"], z["lag_y"], z["lag_inf"])
        mono = (z["mono_x"], z["mono_y"], z["mono_inf"])
        g2_raw = z["g2_raw"]
        g2_pts = [gcurve.g2_decompress(bytes(r), subgroup_check=False)
                  for r in g2_raw]
        return ParsedSetup(lag, mono, g2_pts, g2_raw, digest)

    if len(setup["g2_monomial"]) < 2:
        from .errors import ErrMinSRSSize
        raise ErrMinSRSSize()
    assert len(setup["g1_lagrange"]) == SCALARS_PER_BLOB

    lag_pts = _decompress_g1_batch(setup["g1_lagrange"])
    mono_pts = _decompress_g1_batch(setup["g1_monomial"])
    g2_pts = _decompress_g2_batch(setup["g2_monomial"])
    lag = _points_to_arrays(lag_pts)
    mono = _points_to_arrays(mono_pts)
    g2_raw = np.stack([np.frombuffer(bytes.fromhex(h[2:]), dtype=np.uint8)
                       for h in setup["g2_monomial"]])

    if cache:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        np.savez_compressed(
            cache_path,
            lag_x=lag[0], lag_y=lag[1], lag_inf=lag[2],
            mono_x=mono[0], mono_y=mono[1], mono_inf=mono[2],
            g2_raw=g2_raw)
    return ParsedSetup(lag, mono, g2_pts, g2_raw, digest)
