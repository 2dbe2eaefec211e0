"""Exactness of the -zeros transition extraction vs a direct sample-loop
model of the reference's state machines (decoder.c:617-649 plain,
654-683 differentiated)."""

import numpy as np
import jax.numpy as jnp

from readtape_tpu.decode import gcr as g

PEAK = g.ZEROCROSS_PEAK


def plain_oracle(v):
    """Sample loop over lookfor_zerocrossing: returns confirmed crossings
    as (t_cross, t_conf, is_top), pre-slope-gate (the slope test only
    gates emission downstream)."""
    v_top = v_bot = 0.0
    t_top = t_bot = 0.0
    up_p = dn_p = False
    v_prev = 0.0
    out = []
    for i, x in enumerate(v):
        x = np.float32(x)
        if x > 0:
            dn_p = False
            if v_top < x:
                v_top = x
                if up_p and v_top > PEAK:
                    up_p = False
                    v_bot = 0.0
                    out.append((t_top, i, True))
            if v_prev < 0 and v_bot < -PEAK:
                t_top = i
                up_p = True
        elif x < 0:
            up_p = False
            if v_bot > x:
                v_bot = x
                if dn_p and v_bot < -PEAK:
                    dn_p = False
                    v_top = 0.0
                    out.append((t_bot, i, False))
            if v_prev > 0 and v_top > PEAK:
                t_bot = i
                dn_p = True
        v_prev = x
    return out


def diff_oracle(v):
    """Sample loop over lookfor_differentiated_zerocrossing: returns fired
    crossings as (t_trans, is_top)."""
    up_p = dn_p = False
    t_first = t_last = 0.0
    out = []
    for i, x in enumerate(v):
        x = np.float32(x)
        if x > 0:
            if up_p:
                t = (t_first + t_last) / 2 if t_first > 0 else i - 0.5
                up_p = False
                t_first = 0.0
                out.append((t, True))
            if x > PEAK:
                dn_p = True
                t_first = 0.0
        elif x < 0:
            if dn_p:
                t = (t_first + t_last) / 2 if t_first > 0 else i - 0.5
                dn_p = False
                t_first = 0.0
                out.append((t, False))
            if x < -PEAK:
                up_p = True
                t_first = 0.0
        else:
            t_last = float(i)
            if t_first == 0.0:
                t_first = float(i)
    return out


def run_ours(v, differentiated, cap=4096):
    tr = g.zerocross_transitions(jnp.asarray(v[None, :], jnp.float32),
                                 jnp.float32(20.0), cap, differentiated)
    ok = np.asarray(tr["ok"])[0]
    t = np.asarray(tr["t"])[0]
    dt = np.asarray(tr["dt"])[0]
    top = np.asarray(tr["is_top"])[0]
    assert not bool(np.asarray(tr["overflow"]))
    return [(t[k], t[k] + dt[k], bool(top[k])) for k in range(len(ok))
            if ok[k]]


def noisy_wave(rng, n=4000, spb=18.0, noise=0.35, zero_frac=0.0):
    """A quantized noisy carrier: marginal excursions, frequent exact
    zeros, noise wiggles around the axis -- the regime where the pending/
    stale-extremum rules matter."""
    tt = np.arange(n)
    f = 1.0 / spb * (1 + 0.1 * np.sin(tt / 900))
    sig = np.sin(2 * np.pi * f * tt) * (0.25 + 0.5 * rng.random())
    sig = sig + rng.normal(0, noise, n) * (0.3 + 0.7 * rng.random(n))
    sig = np.round(sig * 40) / 40            # exact zeros appear
    if zero_frac:
        sig[rng.random(n) < zero_frac] = 0.0
    return sig.astype(np.float32)


def test_plain_matches_oracle_fuzz():
    rng = np.random.default_rng(31)
    for trial in range(30):
        v = noisy_wave(rng, noise=0.2 + 0.3 * rng.random(),
                       zero_frac=0.04 * rng.random())
        ours = run_ours(v, differentiated=False)
        ref = [(float(a), float(b), c) for a, b, c in plain_oracle(v)]
        assert ours == ref, f"trial {trial}: {ours[:6]} vs {ref[:6]}"


def test_plain_stale_extremum_raises_threshold():
    """A big positive peak, then small wiggles: the next up-confirmation
    must exceed the STALE maximum (not just ZEROCROSS_PEAK) because v_top
    only resets when a down-crossing confirms."""
    v = np.zeros(64, np.float32)
    v[2:6] = [0.5, 2.0, 1.0, 0.3]            # big top
    v[6:10] = [-0.5, -0.9, -0.4, -0.1]       # deep bottom -> dn confirms
    v[10:14] = [0.3, 0.6, 0.4, 0.1]          # modest top (> PEAK)
    v[14:18] = [-0.2, -0.5, -0.3, -0.05]
    v[18:22] = [0.2, 0.7, 0.5, 0.1]
    ours = run_ours(v, differentiated=False)
    ref = [(float(a), float(b), c) for a, b, c in plain_oracle(v)]
    assert ours == ref
    # the dn confirmation at the deep bottom reset v_top, so the modest
    # tops confirm against PEAK, not against the stale 2.0
    assert (10.0, 11.0, True) in ours


def test_plain_unconfirmed_carry_blocks():
    """Without an intervening down-confirmation the stale maximum blocks
    later smaller up-confirmations entirely."""
    v = np.zeros(48, np.float32)
    v[2:6] = [0.5, 2.0, 1.0, 0.3]            # big top, v_top = 2.0
    v[6:9] = [-0.05, -0.1, -0.04]            # shallow dip: no dn pending
    v[9:13] = [0.3, 0.6, 0.4, 0.1]           # would confirm vs PEAK...
    ours = run_ours(v, differentiated=False)
    ref = [(float(a), float(b), c) for a, b, c in plain_oracle(v)]
    assert ours == ref
    assert all(not top for (_, _, top) in ours)   # no up ever confirms


def test_differentiated_matches_oracle_fuzz():
    rng = np.random.default_rng(37)
    for trial in range(30):
        v = noisy_wave(rng, noise=0.15 + 0.25 * rng.random(),
                       zero_frac=0.15 * rng.random())
        # differentiated signals have small deltas forced to zero
        v[np.abs(v) < 0.08] = 0.0
        ours = run_ours(v, differentiated=True)
        ref = diff_oracle(v)
        got = [(a, c) for a, _, c in ours]
        want = [(float(a), c) for a, c in ref]
        assert got == want, f"trial {trial}: {got[:6]} vs {want[:6]}"


def test_differentiated_no_refire_on_wiggle():
    """attaining-neg, wiggle(+), wiggle(-), + : the C fires once (pending
    consumed by the first positive sample); the old long-range-memory
    approximation fired twice."""
    v = np.zeros(32, np.float32)
    v[2:5] = [-0.5, -0.9, -0.3]
    v[5:7] = [0.05, 0.1]          # consumes the pending, fires
    v[7:9] = [-0.05, -0.1]        # non-attaining wiggle
    v[9:11] = [0.05, 0.15]        # must NOT fire again
    ours = run_ours(v, differentiated=True)
    ref = diff_oracle(v)
    assert [(a, c) for a, _, c in ours] == [(float(a), c) for a, c in ref]
    assert len(ours) == 1
