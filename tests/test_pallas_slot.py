"""The Pallas slot-scan kernel + XLA stream reconstruction must reproduce
the XLA slot scan's final state EXACTLY: bits, dc, kvis, peak-stat
histogram, midbit warnings, first/last bit times, end position — across
multiple parmsets (different clock strategies) on synthesized NRZI
segments, including a multi-block segment (postamble termination)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from readtape_tpu.decode import common as cm
from readtape_tpu.decode import nrzi as nrzi_mod
from readtape_tpu.decode import trackscan as ts
from readtape_tpu.decode import pallas_slot as psl
from readtape_tpu.decode.common import F32
from readtape_tpu.formats import tbin as tb
from readtape_tpu.formats.parms import builtin_parmsets
from readtape_tpu.synth import default_spec, synthesize_tape


def _segment_transitions(S, P, seed=13, nblocks=1, ibg=0.002, ntrks=9):
    """Synthesize a segment and run the (XLA) track scans for P parmsets.
    Returns per-parmset transition buffers + knobs + spb."""
    rng = np.random.default_rng(seed)
    spec = default_spec(tb.MODE_NRZI, ibg_secs=ibg, start_gap_secs=0.001,
                        ntrks=ntrks)
    items = []
    hi = 256 if ntrks == 9 else 64        # 7-track frames carry 6 data bits
    for _ in range(nblocks):
        items.append(("block",
                      bytes(rng.integers(0, hi, 100, dtype=np.uint8))))
    hdr, samples = synthesize_tape(spec, items)
    v = samples.T.astype(np.float32) * (hdr.maxvolts / 32767.0)
    v = v[:, :S]
    if v.shape[1] < S:
        v = np.pad(v, ((0, 0), (0, S - v.shape[1])))
    v = jnp.asarray(v)
    T = v.shape[0]

    ps = builtin_parmsets(tb.MODE_NRZI)
    sets = ps.sets[:P]
    deltat = hdr.tdelta_ns * 1e-9
    spb = 1.0 / (800 * 50 * deltat)
    K = 1024
    rise_floor = jnp.full(T, 0.02, F32)
    min_floor = jnp.full(T, 0.0, F32)

    outs = []
    for p in sets:
        W = cm.pkww_width_for(p.pkww_bitfrac, 800, 50, deltat)
        nxt = ts.loose_jump_table(v, W, rise_floor, min_floor)
        feat = ts.precompute_window_features(v, W, nxt)
        lane = jax.vmap(lambda f, nx: ts.nrzi_track_scan_pre(
            f, nx, W, S, S, K, jnp.float32(p.pkww_rise),
            jnp.float32(p.min_peak), jnp.float32(p.agc_alpha),
            jnp.int32(p.agc_window)))
        fin = lane(feat, nxt)
        keep = jnp.arange(K) < fin["n_admitted"][:, None]
        outs.append(dict(
            tr_s=jnp.where(keep, fin["tr_s"], nrzi_mod.BIG_S),
            tr_t=jnp.where(keep, fin["tr_t"], 0.0),
            tr_agc=jnp.where(keep, fin["tr_agc"], 1.0),
            counts=fin["n_admitted"]))
    return outs, sets, spb, T, K


@pytest.mark.parametrize("nblocks,ibg,ntrks",
                         [(1, 0.002, 9), (3, 0.0008, 9), (1, 0.002, 7)])
def test_slot_kernel_matches_xla(nblocks, ibg, ntrks):
    """The per-track-window kernel (tracks as sublanes, no merged stream,
    no sort) must reproduce the XLA slot scan exactly -- including with
    fewer than 9 tracks occupying the 16 sublane rows."""
    S, P = 8192 if nblocks == 1 else 16384, 3
    trans, sets, spb, T, K = _segment_transitions(S, P, nblocks=nblocks,
                                                  ibg=ibg, ntrks=ntrks)
    maxb = int(S / spb * 1.3) + 64
    max_slots = int(S / spb * 1.25) + 48
    lb, bw = 0.0, 1.0

    # ---- XLA reference ----
    ref = []
    for p, tr in zip(sets, trans):
        st = nrzi_mod.nrzi_slot_scan(
            tr["tr_s"], tr["tr_t"], tr["tr_agc"], tr["counts"], S,
            jnp.float32(spb), jnp.int32(p.clk_window),
            jnp.float32(p.clk_alpha), jnp.float32(p.pulse_adj),
            jnp.float32(p.midbit), jnp.int32(1), False, maxb, max_slots,
            jnp.float32(lb), jnp.float32(bw))
        ref.append(jax.tree.map(np.asarray, st))

    # ---- pallas kernel + reconstruction ----
    tr_s = jnp.stack([tr["tr_s"] for tr in trans])[None]    # [1, P, T, K]
    tr_t = jnp.stack([tr["tr_t"] for tr in trans])[None]
    counts = jnp.stack([tr["counts"] for tr in trans])[None]

    stream, tb_, scal = psl.nrzi_slot_scan_pallas(
        tr_s, tr_t, counts, S=S, T=T, Kp=K, max_slots=max_slots,
        spb_i=float(spb),
        clk_windows=tuple(p.clk_window for p in sets),
        clk_alphas=tuple(p.clk_alpha for p in sets),
        pulse_adjs=tuple(p.pulse_adj for p in sets),
        midbits=tuple(p.midbit for p in sets),
        interpret=True)

    for pi, p in enumerate(sets):
        got = psl.slot_stream_reconstruct(
            stream[0, pi], tb_[0, pi], scal[0, pi],
            T=T, S=S, maxb=maxb, spb=spb,
            stat_leftbin=jnp.float32(lb), stat_binwidth=jnp.float32(bw),
            first_k=jnp.argmin(tr_s[0, pi, :, 0]))
        got = {k: np.asarray(x) for k, x in got.items()}
        r = ref[pi]
        msg = f"parmset {pi} (cw={p.clk_window} ca={p.clk_alpha})"
        np.testing.assert_array_equal(got["kvis"], r["kvis"], err_msg=msg)
        np.testing.assert_array_equal(got["dc"], r["dc"], err_msg=msg)
        np.testing.assert_array_equal(got["bits"], r["bits"], err_msg=msg)
        np.testing.assert_array_equal(got["hist"], r["hist"], err_msg=msg)
        np.testing.assert_array_equal(got["trksums"], r["trksums"],
                                      err_msg=msg)
        assert int(got["missed_midbits"]) == int(r["missed_midbits"]), msg
        np.testing.assert_allclose(got["t_firstbit"], r["t_firstbit"],
                                   rtol=0, atol=0, err_msg=msg)
        np.testing.assert_allclose(got["t_lastbit"], r["t_lastbit"],
                                   rtol=0, atol=0, err_msg=msg)
        assert bool(got["consume_overflow"]) == \
            bool(r["consume_overflow"]), msg
        assert int(got["end_s"]) == int(r["end_s"]), msg
        assert r["dc"].max() > 100, "segment decoded too little"


# ---------------------------------------------------------------------------
# Handcrafted-stream reconstruct fuzz (ADVICE r3): drive the coverage/clamp
# branches (n1=4 holes, dc overflow piling writes on maxb-1, later/zero at
# dca 0) that synthesized tapes rarely reach, and check bits/dc/kvis against
# a direct replay of the XLA scan's write semantics (nrzi.py consume +
# zerocheck index arithmetic, clamps included).
# ---------------------------------------------------------------------------

def _replay_bits(n1, n2, act, T, maxb):
    """Sequential replay of the scan's bit-buffer writes (indices only;
    values are static per op: consume/later-reinsert write 1, zerocheck
    writes 0)."""
    nsl = n1.shape[0]
    bits = np.zeros((T, maxb), np.int8)
    dc = np.zeros(T, np.int64)
    kvis = np.zeros(T, np.int64)
    for i in range(nsl):
        for t in range(T):
            for nn in (n1[i, t], n2[i, t]):
                for j in range(min(nn, 3)):
                    bits[t, min(dc[t] + j, maxb - 1)] = 1
                dc[t] = min(dc[t] + nn, maxb)
                kvis[t] += nn
            a = act[i, t]
            if a == 1:                        # dup: delete the extra 1
                dc[t] -= 1
            elif a == 2:                      # later: insert 0 before the 1
                bits[t, max(dc[t] - 1, 0)] = 0
                bits[t, min(dc[t], maxb - 1)] = 1
                dc[t] = min(dc[t] + 1, maxb)
            elif a == 3:                      # zero: append a 0
                bits[t, min(dc[t], maxb - 1)] = 0
                dc[t] = min(dc[t] + 1, maxb)
    return bits, dc, kvis


def _reconstruct_from(n1, n2, act, T, S, maxb):
    """Pack handcrafted per-slot fields into the kernel's stream/tb layout
    and run slot_stream_reconstruct."""
    nsl = n1.shape[0]
    assert nsl % psl.CH == 0
    nch = nsl // psl.CH
    tbt = np.zeros((nsl, 16, psl.F), np.float32)
    tbt[:, :T, psl.TB_N1] = n1
    tbt[:, :T, psl.TB_N2] = n2
    tbt[:, :T, psl.TB_ACT] = act
    for j in range(3):
        tj = np.arange(nsl, dtype=np.float32)[:, None] * 10 + j
        tbt[:, :T, psl.TB_TJ10 + j] = np.where(j < np.minimum(n1, 3), tj, 0)
        tbt[:, :T, psl.TB_TJ20 + j] = np.where(j < np.minimum(n2, 3),
                                               tj + 5, 0)
    tbt[:, :T, psl.TB_LP] = np.arange(nsl, dtype=np.float32)[:, None] + 0.5
    tb_ = (tbt.reshape(nch, psl.CH, 16, psl.F).transpose(0, 2, 1, 3)
           .reshape(nch, 16, psl.CH * psl.F))
    stream = np.zeros((nsl, 128), np.float32)
    stream[:, psl.L_POST0] = 1.0          # post area: no stat recording
    stream[:, psl.L_B0] = 19.0
    stream[:, psl.L_TLC2] = np.arange(nsl, dtype=np.float32) * 10
    live = np.float32(psl.F_LIVE)
    stream[:, psl.L_FLAGS] = live
    scal = np.zeros(128, np.float32)
    scal[2] = S
    got = psl.slot_stream_reconstruct(
        jnp.asarray(stream), jnp.asarray(tb_), jnp.asarray(scal),
        T=T, S=S, maxb=maxb, spb=19.0,
        stat_leftbin=jnp.float32(0.0), stat_binwidth=jnp.float32(1.0))
    return {k: np.asarray(v) for k, v in got.items()}


def test_reconstruct_handcrafted_branches():
    """Directed cases: n1=4 hole, later at dca=0, zero at dca=0, write
    pile-up at maxb-1 (dc overflow), later/zero during overflow."""
    T, S, maxb = 3, 4096, 8
    nsl = 16
    cases = [
        # (slot, track, n1, n2, act)
        (0, 0, 4, 0, 0),      # hole: 4 seen, only 3 written
        (1, 0, 4, 2, 0),      # hole then round 2 past the hole
        (0, 1, 0, 0, 2),      # later at dca=0 (i0 clamps to 0)
        (0, 2, 0, 0, 3),      # zero at dca=0
        (2, 0, 4, 4, 0),      # dc hits 11 -> clamp to maxb=8
        (3, 0, 3, 0, 2),      # later during overflow (writes at maxb-1)
        (4, 0, 0, 0, 3),      # zero during overflow
        (5, 0, 2, 0, 1),      # dup after overflow (dc back below maxb)
        (6, 0, 1, 0, 3),
    ]
    n1 = np.zeros((nsl, T), np.int64)
    n2 = np.zeros((nsl, T), np.int64)
    act = np.zeros((nsl, T), np.int64)
    for s, t, a, b, c in cases:
        n1[s, t], n2[s, t], act[s, t] = a, b, c
    got = _reconstruct_from(n1, n2, act, T, S, maxb)
    bits, dc, kvis = _replay_bits(n1, n2, act, T, maxb)
    np.testing.assert_array_equal(got["bits"], bits)
    np.testing.assert_array_equal(got["dc"], dc)
    np.testing.assert_array_equal(got["kvis"], kvis)


def test_reconstruct_fuzz_vs_replay():
    """Randomized slot streams with a tiny maxb so clamps fire constantly;
    dup only ever follows an append (the kernel's invariant)."""
    rng = np.random.default_rng(42)
    T, S = 5, 4096
    for maxb in (6, 10, 17):
        for trial in range(8):
            nsl = 24
            n1 = rng.integers(0, 5, (nsl, T))
            n2 = np.where(rng.random((nsl, T)) < 0.4,
                          rng.integers(0, 5, (nsl, T)), 0)
            act = rng.integers(0, 4, (nsl, T))
            # dup needs a preceding append in the same slot
            act = np.where((act == 1) & (n1 + n2 == 0), 0, act)
            got = _reconstruct_from(n1, n2, act, T, S, maxb)
            bits, dc, kvis = _replay_bits(n1, n2, act, T, maxb)
            msg = f"maxb={maxb} trial={trial}"
            np.testing.assert_array_equal(got["bits"], bits, err_msg=msg)
            np.testing.assert_array_equal(got["dc"], dc, err_msg=msg)
            np.testing.assert_array_equal(got["kvis"], kvis, err_msg=msg)
