"""GCR ECC correction: the device implementation of the reference's full
correct_errors API (decode_gcr.c:233-341) must match the host oracle
(gcr_tables.correct_errors_host, itself validated against a harness built
from the reference binary for every 1- and 2-bit mask) — and two-track
erasure correction must actually reconstruct damaged groups."""

import numpy as np
import jax
import jax.numpy as jnp

from readtape_tpu.decode import gcr as gcr_mod
from readtape_tpu.decode import gcr_tables as gt
from readtape_tpu.decode.common import I32


ALL_MASKS = ([1 << i for i in range(9)] +
             [(1 << i) | (1 << j) for i in range(9) for j in range(i + 1, 9)])


def _device(frames, mask):
    ok, out = jax.jit(gcr_mod.gcr_correct_errors)(
        jnp.asarray(frames, I32), jnp.int32(mask))
    return bool(ok), [int(x) for x in np.asarray(out)]


def _to_tom(f):
    """Decode-path (msb..lsb,P) frame -> the reference's tom_order word
    (the layout correct_errors_host and the C API use)."""
    return ((f >> 1) & 0xFF) | ((f & 1) << 8)


def _from_tom(t):
    return ((t & 0xFF) << 1) | ((t >> 8) & 1)


def _host(frames, mask):
    """Host oracle adapted to the device function's frame layout."""
    ok, out = gt.correct_errors_host([_to_tom(f) for f in frames], mask)
    return ok, [_from_tom(int(x)) for x in out[:8]]


def test_device_matches_host_all_masks():
    rng = np.random.default_rng(17)
    for mask in ALL_MASKS:
        for _ in range(8):
            f = [int(x) for x in rng.integers(0, 512, 8)]
            h_ok, h_out = _host(f, mask)
            d_ok, d_out = _device(f, mask)
            assert d_ok == h_ok, f"ok mismatch mask={mask:03x} f={f}"
            if h_ok:
                assert d_out == h_out, \
                    f"frames mismatch mask={mask:03x} f={f}"


def _valid_group(rng):
    """Build a parity- and ECC-consistent 8-frame dgroup: 7 data frames
    with odd parity plus the ECC frame the reference would compute."""
    data = []
    for _ in range(7):
        byte = int(rng.integers(0, 256))
        par = bin(byte).count("1") & 1
        data.append((byte << 1) | (par ^ 1))        # odd parity
    frames7 = jnp.asarray(data, I32)
    ecc = int(gcr_mod.gcr_compute_ecc_vec(frames7))
    epar = bin(ecc).count("1") & 1
    frames8 = data + [(ecc << 1) | (epar ^ 1)]
    return frames8


def _tom_bit(trk):
    """Track number (0 = msb data ... 7 = lsb data, 8 = parity) -> bit in
    the reference's tom_order mask space."""
    return 8 if trk == 8 else 7 - trk


def test_two_track_erasure_reconstructs():
    rng = np.random.default_rng(23)
    for _ in range(20):
        good = _valid_group(rng)
        t1, t2 = rng.choice(9, size=2, replace=False)
        mask = (1 << _tom_bit(int(t1))) | (1 << _tom_bit(int(t2)))
        # corrupt both tracks with random bit flips across the group
        bad = list(good)
        for i in range(8):
            for trk in (int(t1), int(t2)):
                if rng.integers(0, 2):
                    bit = 0 if trk == 8 else 8 - trk
                    bad[i] ^= 1 << bit
        ok, out = _device(bad, mask)
        assert ok
        assert out == good, f"tracks {t1},{t2} not reconstructed"
        # the host oracle agrees
        h_ok, h_out = _host(bad, mask)
        assert h_ok and h_out == good


def test_correct2_recovers_two_track_damaged_dgroup():
    """End-to-end through gcr_postprocess: a dgroup whose 5-bit codes are
    destroyed on TWO tracks (invalid codes -> wrong nibbles + parity
    errors) is unrecoverable by the reference's single-track fix but
    reconstructs exactly under the -correct2 extension, which identifies
    the bad tracks from the invalid codes."""
    from readtape_tpu.synth.synthesize import gcr_storage_bits, default_spec
    from readtape_tpu.formats import tbin as tb

    rng = np.random.default_rng(41)
    data = bytes(rng.integers(0, 256, 35, dtype=np.uint8))   # 5 dgroups
    spec = default_spec(tb.MODE_GCR)
    frames_bits = gcr_storage_bits(data, spec)
    nbits = len(frames_bits[0])
    maxb = -(-nbits // 5) * 5 + 40
    bits = np.zeros((9, maxb), np.int8)
    for t in range(9):
        bits[t, :nbits] = frames_bits[t]

    # dgroup 2 starts after 16 SYNC + MARK1 + 2 dgroups = (17 + 4) * 5 bits
    g0 = (17 + 2 * 2) * 5
    t1, t2 = 2, 5
    for trk in (t1, t2):
        bits[trk, g0:g0 + 10] = 0          # sgroup 00000 twice: invalid

    dcs = jnp.full(9, nbits, I32)
    args = (jnp.asarray(bits), dcs, jnp.int32(nbits), jnp.int32(1))

    post_plain = jax.jit(
        lambda b, d, m, p: gcr_mod.gcr_postprocess(b, d, m, p, True, maxb))(
            *args)
    post_c2 = jax.jit(
        lambda b, d, m, p: gcr_mod.gcr_postprocess(
            b, d, m, p, True, maxb, do_correct2=True))(*args)

    n = int(post_c2["bytenum"])
    assert n == len(data), f"decoded {n} bytes, wrote {len(data)}"
    got = (np.asarray(post_c2["data"])[:n] >> 1) & 0xFF
    assert bytes(got.astype(np.uint8)) == data, "correct2 did not reconstruct"
    assert int(post_c2["vparity_errs"]) == 0
    assert int(post_c2["corrected_bits"]) >= 1
    # the reference's single-track path could not fix it
    assert int(post_plain["vparity_errs"]) > 0
    got_plain = (np.asarray(post_plain["data"])[:n] >> 1) & 0xFF
    assert bytes(got_plain.astype(np.uint8)) != data


def test_single_track_syndrome_location():
    """The decode path's 0x01 call: a single damaged track is located by
    the syndrome alone and corrected."""
    rng = np.random.default_rng(29)
    for _ in range(20):
        good = _valid_group(rng)
        trk = int(rng.integers(0, 9))
        bad = list(good)
        flipped = False
        for i in range(8):
            if rng.integers(0, 2):
                bit = 0 if trk == 8 else 8 - trk
                bad[i] ^= 1 << bit
                flipped = True
        if not flipped:
            bad[3] ^= 1 << (0 if trk == 8 else 8 - trk)
        ok, out = _device(bad, 0x01)
        assert ok and out == good, f"track {trk} not corrected"
