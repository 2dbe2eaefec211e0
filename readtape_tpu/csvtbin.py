"""csvtbin: convert between CSV logic-analyzer captures and .tbin files.

Mirrors the reference utility (csvtbin.c): CSV -> TBIN with track reorder to
canonical (msb..lsb,P), optional skip/subsample/stopaft/time-trim, scale,
invert, automatic maxvolts estimation with a -redo rescale pass; and
TBIN -> CSV regeneration (optionally staggered for graphing).

  csvtbin <options> infile outfile
    -ntrks=n -order=s -mode={pe|nrzi|gcr|ww} -bpi=n -ips=n
    -invert -reverse -maxvolts=v -descr=s
    -skip=n -subsample=n -stopaft=n -start=secs -end=secs -stagger
"""

from __future__ import annotations

import os
import sys

import numpy as np

from .formats import tbin as tb
from .formats.csvfmt import read_csv, write_csv

MODES = {"pe": tb.MODE_PE, "nrzi": tb.MODE_NRZI, "gcr": tb.MODE_GCR,
         "ww": tb.MODE_WW, "whirlwind": tb.MODE_WW}

USAGE = __doc__


def parse_order(order: str, nheads: int):
    if any(c in "CLMclmx" for c in order) and not order.isdigit():
        return None          # Whirlwind orders are kept in the header
    head_to_trk = []
    for ch in order:
        head_to_trk.append(len(order) - 1 if ch.upper() == "P" else int(ch))
    if sorted(head_to_trk) != list(range(len(order))):
        raise SystemExit(f"bad -order: {order}")
    return head_to_trk


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    opts = dict(ntrks=0, order=None, mode=tb.MODE_UNKNOWN, bpi=0.0, ips=0.0,
                invert=False, reverse=False, maxvolts=0.0, descr="",
                skip=0, subsample=1, stopaft=0, start=0.0, end=0.0,
                stagger=False)
    files = []
    for arg in argv:
        if arg.startswith("-"):
            a = arg[1:]
            low = a.lower()
            if low.startswith("ntrks="):
                opts["ntrks"] = int(a[6:])
            elif low.startswith("order="):
                opts["order"] = a[6:]
            elif low.startswith("mode="):
                opts["mode"] = MODES[a[5:].lower()]
            elif low in MODES:
                opts["mode"] = MODES[low]
            elif low.startswith("bpi="):
                opts["bpi"] = float(a[4:])
            elif low.startswith("ips="):
                opts["ips"] = float(a[4:])
            elif low == "invert":
                opts["invert"] = True
            elif low == "reverse":
                opts["reverse"] = True
            elif low.startswith("maxvolts="):
                opts["maxvolts"] = float(a[9:])
            elif low.startswith("descr="):
                opts["descr"] = a[6:]
            elif low.startswith("skip="):
                opts["skip"] = int(a[5:])
            elif low.startswith("subsample="):
                opts["subsample"] = int(a[10:])
            elif low.startswith("stopaft="):
                opts["stopaft"] = int(a[8:])
            elif low.startswith("start="):
                opts["start"] = float(a[6:])
            elif low.startswith("end="):
                opts["end"] = float(a[4:])
            elif low == "stagger":
                opts["stagger"] = True
            else:
                raise SystemExit(f"bad option: {arg}\n{USAGE}")
        else:
            files.append(arg)
    if len(files) != 2:
        print(USAGE, file=sys.stderr)
        return 4
    src, dst = files
    if src.lower().endswith(".csv"):
        return csv_to_tbin(src, dst, opts)
    return tbin_to_csv(src, dst, opts)


def csv_to_tbin(src, dst, o) -> int:
    t0, deltat, volts = read_csv(src)
    if o["skip"]:
        volts = volts[o["skip"]:]
    if o["subsample"] > 1:
        volts = volts[o["subsample"] - 1::o["subsample"]]
        deltat *= o["subsample"]
    if o["start"] or o["end"]:
        n = volts.shape[0]
        i0 = int(max(0, (o["start"] - t0) / deltat)) if o["start"] else 0
        i1 = int(min(n, (o["end"] - t0) / deltat)) if o["end"] else n
        volts = volts[i0:i1]
        t0 += i0 * deltat
    if o["stopaft"]:
        volts = volts[:o["stopaft"]]
    if o["invert"]:
        volts = -volts

    order = parse_order(o["order"], volts.shape[1]) if o["order"] else None
    flags = tb.TBIN_NO_REORDER
    trkorder = ""
    if order is not None:
        cols = np.zeros(len(order), np.int64)
        for head, trkn in enumerate(order):
            cols[trkn] = head
        volts = volts[:, cols]
        flags = 0                       # tracks were reordered to canonical
    elif o["order"]:
        trkorder = o["order"]           # complex (WW) order kept in header

    # estimate maxvolts like csv_preread (csvtbin.c:618-658): max |v| + 0.5,
    # rounded up; no -redo needed since we scan everything up front
    maxvolts = o["maxvolts"] or float(np.ceil(np.abs(volts).max() * 2) / 2 + 0.5)
    samples = tb.volts_to_samples(volts, maxvolts)
    hdr = tb.TbinHeader(
        descr=o["descr"], flags=flags | (o["invert"] and tb.TBIN_INVERTED or 0)
        | (o["reverse"] and tb.TBIN_REVERSED or 0),
        ntrks=volts.shape[1], tdelta_ns=int(round(deltat * 1e9)),
        maxvolts=maxvolts, mode=o["mode"], bpi=o["bpi"], ips=o["ips"],
        trkorder=trkorder, tstart_ns=int(round(t0 * 1e9)))
    tb.write_tbin(dst, hdr, samples)
    print(f"wrote {dst}: {samples.shape[0]:,} samples x {samples.shape[1]} "
          f"tracks, maxvolts {maxvolts:.1f}, {hdr.tdelta_ns} ns/sample")
    return 0


def tbin_to_csv(src, dst, o) -> int:
    hdr, samples = tb.read_tbin(src)
    volts = tb.samples_to_volts(np.asarray(samples), hdr.maxvolts)
    if o["skip"]:
        volts = volts[o["skip"]:]
    if o["stopaft"]:
        volts = volts[:o["stopaft"]]
    if o["invert"]:
        volts = -volts
    if o["stagger"]:                      # offset tracks for graphing
        volts = volts + np.arange(volts.shape[1])[None, :] * (
            hdr.maxvolts / 2)
    write_csv(dst, hdr.tstart_ns * 1e-9, hdr.tdelta_ns * 1e-9, volts)
    print(f"wrote {dst}: {volts.shape[0]:,} samples x {volts.shape[1]} tracks")
    return 0


if __name__ == "__main__":
    sys.exit(main())
