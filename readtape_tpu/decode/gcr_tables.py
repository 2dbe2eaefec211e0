"""GCR 6250 (9042 frpi) tables and GF(2^8) error-correction algebra.

The 5-bit group code, special subgroups, ECC generator rows, and the
single/two-track Reed-Solomon-style correction follow ANSI X3.54 as
implemented in decode_gcr.c:111-341 (ECC analysis by Tom Howell).
"""

from __future__ import annotations

import numpy as np

# map from 5-bit storage code to 4-bit data; +16 = invalid (nearest value)
GCR_DATAMAP = np.asarray([
    16 + 10, 16 + 9, 16 + 2, 16 + 3, 16 + 5, 16 + 5, 16 + 6,
    16 + 7, 16 + 10, 9, 10, 11, 16 + 13, 13, 14,
    15, 16 + 2, 16 + 5, 2, 3, 16 + 5, 5,
    6, 7, 16 + 0, 0, 8, 1, 16 + 12, 4, 12, 16 + 15], np.int32)

GCR_MARK1 = 0b00111
GCR_MARK2 = 0b11100
GCR_SYNC = 0b11111

# ECC generator rows (56-bit each), split into two 28-bit halves for int32
_ECC_ROWS = [0x0F6A71994C5230, 0x70110840108004, 0x5A701108401080,
             0x372BE95D5A7011, 0xE95D5A70110840, 0x4C523001884412,
             0x2BE95D5A701108, 0x5D5A7011084010]
ECC_LO = np.asarray([r & 0xFFFFFFF for r in _ECC_ROWS], np.int32)
ECC_HI = np.asarray([(r >> 28) & 0xFFFFFFF for r in _ECC_ROWS], np.int32)

# correction matrices M1..M7 (decode_gcr.c:236-244)
CORR_MS = np.asarray([
    [0x00] * 8,
    [0xFE, 0xFC, 0xF8, 0x0F, 0xE0, 0x3F, 0x7F, 0xFF],
    [0x54, 0xA8, 0x50, 0xF5, 0xBF, 0x2A, 0x55, 0xAA],
    [0x93, 0x26, 0x4D, 0x09, 0x80, 0x92, 0x24, 0x49],
    [0xBA, 0x75, 0xEA, 0x6E, 0x66, 0x77, 0xEE, 0xDD],
    [0x11, 0x23, 0x46, 0x9C, 0x29, 0x42, 0x84, 0x08],
    [0x7C, 0xF9, 0xF3, 0x9A, 0x49, 0xEF, 0xDF, 0xBE],
    [0x39, 0x72, 0xE5, 0xF3, 0xDF, 0x87, 0x0E, 0x1C]], np.int32)

BIT_ORDER = np.asarray([4, 2, 1, 5, 7, 3, 6, 0, 8], np.int32)
UNDO_ORDER = np.asarray([7, 2, 1, 5, 0, 3, 6, 4, 8], np.int32)


def _reorder9(x: int, order) -> int:
    out = 0
    for i in range(9):
        if (x >> i) & 1:
            out |= 1 << int(order[i])
    return out


def _reverse8(x: int) -> int:
    out = 0
    for i in range(8):
        if (x >> i) & 1:
            out |= 1 << (7 - i)
    return out


def _times_alpha(s: int) -> int:
    bit7 = (s >> 7) & 1
    s = (s << 1) & 0xFF
    if bit7:
        s ^= 0x39
    return s


def _divby_alpha(s: int) -> int:
    bit0 = s & 1
    s >>= 1
    if bit0:
        s ^= 0x9C
    return s


def _parity(x: int) -> int:
    return bin(x).count("1") & 1


def correct_errors_host(frames9, bad_tracks: int = 0x01):
    """Single/two-track GCR error correction over one 8-frame group
    (7 data + ECC), frames in p(msb)...(lsb) bit order like the reference's
    tom_order (decode_gcr.c:233-341). Pure-python reference implementation
    used by the device code's lookup tables and by tests.
    Returns (ok, corrected_frames)."""
    B = [int(_reorder9(f, BIT_ORDER)) for f in frames9[:8]]
    bt = _reorder9(bad_tracks, BIT_ORDER)
    ptrs = [i for i in range(9) if (bt >> i) & 1][:2]
    pi = ptrs[0] if ptrs else 0
    pj = ptrs[1] if len(ptrs) > 1 else pi

    S1p = 0xFF
    S2p = 0
    for i in range(8):
        S1p ^= _parity(B[i]) << i
        S2p = _times_alpha(S2p)
        S2p ^= B[i] & 0xFF
    S2p = _reverse8(S2p)

    if pi == pj:
        errloc = -1
        Sxp, Syp = S1p, S2p
        if S1p != 0:
            if S2p == 0:
                errloc = 8
            else:
                for i in range(8):
                    if Syp == Sxp:
                        errloc = i
                        break
                    Sxp = _divby_alpha(Sxp)
            if errloc < 0:
                return False, frames9
        if errloc >= 0:
            for i in range(8):
                if S1p & (1 << i):
                    B[i] ^= 1 << errloc
    else:
        # Mk is only consulted when pj != 8 (the reference computes
        # Ms[pj - pi] unconditionally, which for pi=0, pj=8 is an
        # out-of-bounds read in the C -- harmless there only because the
        # result is unused)
        Mk = ([_reverse8(int(CORR_MS[pj - pi][j])) for j in range(8)]
              if pj != 8 else [0] * 8)
        Syp = S2p
        for _ in range(pi):
            Syp = _times_alpha(Syp)
        Syp ^= S1p
        if pj == 8:
            e2p = Syp
        else:
            e2p = 0
            for i in range(8):
                e2p |= (_parity(Mk[i] & Syp) & 1) << (7 - i)
        e1p = e2p ^ S1p
        for i in range(8):
            if e1p & (1 << i):
                B[i] ^= 1 << pi
            if e2p & (1 << i):
                B[i] ^= 1 << pj
    out = [int(_reorder9(b, UNDO_ORDER)) for b in B]
    return True, out
