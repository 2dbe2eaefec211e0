"""Debug trace spreadsheet (<base>.trace.csv).

The reference's trace.c (DEBUG builds only) writes a time-series CSV of all
track voltages plus event lanes for plotting in a spreadsheet, using a ring
buffer so events discovered late (window peak detection lags) land at their
true timestamps. Here the decode pipeline already produces every event with
its true (refined) time, so the trace is a straightforward join of the
waveform against the event streams -- and it's a *runtime* option (-trace),
not a compile-time one.

Lanes: per-track voltage, plus "peak" (up/down tick at each admitted flux
transition) and "data" (tick at each emitted bit) event rows, in the same
UPTICK/DNTICK visual style (decoder.h:62-67).
"""

from __future__ import annotations

import numpy as np

UPTICK = 0.75
DNTICK = -0.75


def write_trace(path: str, t0: float, deltat: float, volts: np.ndarray,
                peaks=None, bits=None, start: float = None,
                end: float = None, max_lines: int = 10000) -> int:
    """volts: [N, T]. peaks: list per track of (time_s, is_top). bits: list
    per track of (time_s, bitval). start/end: trigger window in seconds
    (defaults to the first max_lines samples). Returns lines written."""
    n, T = volts.shape
    i0 = 0 if start is None else max(0, int((start - t0) / deltat))
    i1 = n if end is None else min(n, int((end - t0) / deltat) + 1)
    i1 = min(i1, i0 + max_lines)

    def bucketize(events):
        lanes = [dict() for _ in range(T)]
        if events is None:
            return lanes
        for trk in range(T):
            for (t, val) in events[trk]:
                idx = int(round((t - t0) / deltat))
                if i0 <= idx < i1:
                    lanes[trk][idx] = val
        return lanes

    peak_lanes = bucketize(peaks)
    bit_lanes = bucketize(bits)

    with open(path, "w") as f:
        f.write("time")
        for trk in range(T):
            f.write(f",v{trk}")
        for trk in range(T):
            f.write(f",peak{trk}")
        for trk in range(T):
            f.write(f",data{trk}")
        f.write("\n")
        for i in range(i0, i1):
            f.write(f"{t0 + i * deltat:.8f}")
            for trk in range(T):
                f.write(f",{volts[i, trk]:.4f}")
            for trk in range(T):
                ev = peak_lanes[trk].get(i)
                f.write(",%0.2f" % ((UPTICK if ev else DNTICK)
                                    if ev is not None else 0.0))
            for trk in range(T):
                ev = bit_lanes[trk].get(i)
                f.write(",%0.2f" % ((UPTICK if ev else DNTICK)
                                    if ev is not None else 0.0))
            f.write("\n")
    return i1 - i0
