"""VP8 (lossy WebP) twin validation (r6). Discipline as the other codec
suites: streams come from the module encoder, but every expectation is
recomputed here with INDEPENDENTLY WRITTEN numpy/scalar code — a
different formulation of the same public RFC 6386 algorithms (general
geometric formulas where the module unrolls, exact matrix form for the
WHT, scalar loops where the module vectorizes) — so shared-code bugs
can't self-confirm.  End-to-end: decode_vp8_planes(stream) must equal a
from-scratch reconstruction built only from the encoder's debug record
(modes + quantized coefficients), bit-exactly, including both loop
filters."""

from __future__ import annotations

import numpy as np
import pytest

import trefoil_spark.functions.vp8 as V


# ---------------------------------------------------------------------------
# independent reimplementations
# ---------------------------------------------------------------------------

_W = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
              dtype=np.int64)


def tiwht(X):
    """Exact matrix form of §14.3 inverse WHT: col pass is W@X (integer,
    shift-free), row pass (t@W.T + 3) >> 3 with arithmetic shift."""
    t = _W @ np.asarray(X, dtype=np.int64)
    return (t @ _W.T + 3) >> 3


def tidct(X):
    """Vectorized-by-stage reformulation of the §14.3 integer IDCT."""
    X = np.asarray(X, dtype=np.int64)
    c0, c1, c2, c3 = X[0], X[1], X[2], X[3]
    a = c0 + c2
    b = c0 - c2
    c = (c1 * 35468 >> 16) - (c3 + (c3 * 20091 >> 16))
    d = (c1 + (c1 * 20091 >> 16)) + (c3 * 35468 >> 16)
    t = np.stack([a + d, b + c, b - c, a - d])  # (4 rows, 4 cols)
    r0, r1, r2, r3 = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
    a = r0 + r2
    b = r0 - r2
    c = (r1 * 35468 >> 16) - (r3 + (r3 * 20091 >> 16))
    d = (r1 + (r1 * 20091 >> 16)) + (r3 * 35468 >> 16)
    return np.stack([(a + d + 4) >> 3, (b + c + 4) >> 3,
                     (b - c + 4) >> 3, (a - d + 4) >> 3], axis=1)


def _a2(a, b):
    return (a + b + 1) >> 1


def _a3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def tpredict_b(mode, above, aright, left, p):
    """General geometric formulas for the ten §12.3 subblock modes (the
    module unrolls them assignment-by-assignment)."""
    A = [int(x) for x in above] + [int(x) for x in aright]
    L = [int(x) for x in left]
    p = int(p)
    out = np.zeros((4, 4), dtype=np.int64)
    if mode == V.B_DC_PRED:
        out[:] = (sum(A[:4]) + sum(L) + 4) >> 3
    elif mode == V.B_TM_PRED:
        for r in range(4):
            for c in range(4):
                out[r, c] = min(255, max(0, A[c] + L[r] - p))
    elif mode == V.B_VE_PRED:
        ext = [p] + A[:5]
        for c in range(4):
            out[:, c] = _a3(ext[c], ext[c + 1], ext[c + 2])
    elif mode == V.B_HE_PRED:
        ext = [p] + L + [L[3]]
        for r in range(4):
            out[r, :] = _a3(ext[r], ext[r + 1], ext[r + 2])
    elif mode == V.B_LD_PRED:
        for r in range(4):
            for c in range(4):
                d = r + c
                out[r, c] = (_a3(A[d], A[d + 1], A[d + 2]) if d < 6
                             else _a3(A[6], A[7], A[7]))
    elif mode == V.B_RD_PRED:
        e = [L[3], L[2], L[1], L[0], p] + A[:4]
        for r in range(4):
            for c in range(4):
                i = c - r + 3
                out[r, c] = _a3(e[i], e[i + 1], e[i + 2])
    elif mode == V.B_VR_PRED:
        e = [L[3], L[2], L[1], L[0], p] + A[:4]
        for r in range(4):
            for c in range(4):
                x = 2 * c - r
                if x < 0:
                    out[r, c] = _a3(e[x + 4], e[x + 5], e[x + 6])
                elif x % 2 == 0:
                    out[r, c] = _a2(e[4 + x // 2], e[5 + x // 2])
                else:
                    k = (x + 1) // 2
                    out[r, c] = _a3(e[3 + k], e[4 + k], e[5 + k])
    elif mode == V.B_VL_PRED:
        for r in range(4):
            for c in range(4):
                x = 2 * c + r
                if (r, c) == (2, 3):
                    out[r, c] = _a3(A[4], A[5], A[6])
                elif (r, c) == (3, 3):
                    out[r, c] = _a3(A[5], A[6], A[7])
                elif x % 2 == 0:
                    out[r, c] = _a2(A[x // 2], A[x // 2 + 1])
                else:
                    k = (x - 1) // 2
                    out[r, c] = _a3(A[k], A[k + 1], A[k + 2])
    elif mode == V.B_HD_PRED:
        e = [L[3], L[2], L[1], L[0], p] + A[:4]
        for r in range(4):
            for c in range(4):
                y = 2 * r - c
                if y < 0:
                    out[r, c] = _a3(e[2 - y], e[3 - y], e[4 - y])
                elif y % 2 == 0:
                    out[r, c] = _a2(e[3 - y // 2], e[4 - y // 2])
                else:
                    k = (y + 1) // 2
                    out[r, c] = _a3(e[3 - k], e[4 - k], e[5 - k])
    elif mode == V.B_HU_PRED:
        for r in range(4):
            for c in range(4):
                z = 2 * r + c
                if z < 5 and z % 2 == 0:
                    out[r, c] = _a2(L[z // 2], L[z // 2 + 1])
                elif z < 5:
                    out[r, c] = _a3(L[z // 2], L[z // 2 + 1],
                                    L[min(3, z // 2 + 2)])
                elif z == 5:
                    out[r, c] = _a3(L[2], L[3], L[3])
                else:
                    out[r, c] = L[3]
    return out


def tpred_whole(buf, y0, x0, n, mode, above_ok, left_ok):
    above = buf[y0 - 1, x0:x0 + n].astype(np.int64)
    left = buf[y0:y0 + n, x0 - 1].astype(np.int64)
    p = int(buf[y0 - 1, x0 - 1])
    if mode == V.DC_PRED:
        if above_ok and left_ok:
            dc = (above.sum() + left.sum() + n) >> (n.bit_length())
        elif above_ok:
            dc = (above.sum() + n // 2) >> (n.bit_length() - 1)
        elif left_ok:
            dc = (left.sum() + n // 2) >> (n.bit_length() - 1)
        else:
            dc = 128
        return np.full((n, n), dc, dtype=np.int64)
    if mode == V.V_PRED:
        return np.broadcast_to(above, (n, n)).copy()
    if mode == V.H_PRED:
        return np.broadcast_to(left[:, None], (n, n)).copy()
    out = left[:, None] + above[None, :] - p
    return np.clip(out, 0, 255)


def _cl(v):
    return max(-128, min(127, v))


def _tnormal_px(px, mb_edge, lim, il, hev_t):
    """Scalar §15.2-15.3 normal filter on one 8-sample line."""
    p3, p2, p1, p0, q0, q1, q2, q3 = px
    ok = (abs(p3 - p2) <= il and abs(p2 - p1) <= il and abs(p1 - p0) <= il
          and abs(q1 - q0) <= il and abs(q2 - q1) <= il
          and abs(q3 - q2) <= il
          and abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= lim)
    if not ok:
        return list(px)
    hev = abs(p1 - p0) > hev_t or abs(q1 - q0) > hev_t
    P2, P1, P0 = p2 - 128, p1 - 128, p0 - 128
    Q0, Q1, Q2 = q0 - 128, q1 - 128, q2 - 128
    if mb_edge and not hev:
        w = _cl(_cl(P1 - Q1) + 3 * (Q0 - P0))
        a = _cl((27 * w + 63) >> 7)
        Q0, P0 = _cl(Q0 - a), _cl(P0 + a)
        a = _cl((18 * w + 63) >> 7)
        Q1, P1 = _cl(Q1 - a), _cl(P1 + a)
        a = _cl((9 * w + 63) >> 7)
        Q2, P2 = _cl(Q2 - a), _cl(P2 + a)
    else:
        use_outer = 1 if mb_edge else (1 if hev else 0)
        a = _cl((_cl(P1 - Q1) if use_outer else 0) + 3 * (Q0 - P0))
        F1 = _cl(a + 4) >> 3
        F2 = _cl(a + 3) >> 3
        Q0 = _cl(Q0 - F1)
        P0 = _cl(P0 + F2)
        if not mb_edge and not hev:
            a = (F1 + 1) >> 1
            Q1 = _cl(Q1 - a)
            P1 = _cl(P1 + a)
    return [p3, P2 + 128, P1 + 128, P0 + 128,
            Q0 + 128, Q1 + 128, Q2 + 128, q3]


def _tsimple_px(px, lim):
    p1, p0, q0, q1 = px
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 > lim:
        return list(px)
    P1, P0, Q0, Q1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    a = _cl(_cl(P1 - Q1) + 3 * (Q0 - P0))
    F1 = _cl(a + 4) >> 3
    F2 = _cl(a + 3) >> 3
    return [p1, _cl(P0 + F2) + 128, _cl(Q0 - F1) + 128, q1]


def tloop_filter(ybuf, ubuf, vbuf, mb_w, mb_h, levels, subs, ftype, sharp):
    simple = ftype == 1

    def v_edge(buf, y0, x, n, mb_edge, lim, il, hv):
        for yy in range(y0, y0 + n):
            if simple:
                buf[yy, x - 2:x + 2] = _tsimple_px(
                    [int(t) for t in buf[yy, x - 2:x + 2]], lim)
            else:
                buf[yy, x - 4:x + 4] = _tnormal_px(
                    [int(t) for t in buf[yy, x - 4:x + 4]], mb_edge, lim, il, hv)

    def h_edge(buf, y, x0, n, mb_edge, lim, il, hv):
        for xx in range(x0, x0 + n):
            if simple:
                buf[y - 2:y + 2, xx] = _tsimple_px(
                    [int(t) for t in buf[y - 2:y + 2, xx]], lim)
            else:
                buf[y - 4:y + 4, xx] = _tnormal_px(
                    [int(t) for t in buf[y - 4:y + 4, xx]], mb_edge, lim, il, hv)

    for my in range(mb_h):
        for mx in range(mb_w):
            lvl = levels[my][mx]
            if not lvl:
                continue
            il = lvl
            if sharp:
                il >>= 2 if sharp > 4 else 1
                il = min(il, 9 - sharp)
            il = max(il, 1)
            hv = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            mlim = (lvl + 2) * 2 + il
            slim = lvl * 2 + il
            sub = subs[my][mx]
            y0, x0 = 1 + 16 * my, 1 + 16 * mx
            if mx:
                v_edge(ybuf, y0, x0, 16, True, mlim, il, hv)
            if sub:
                for dx in (4, 8, 12):
                    v_edge(ybuf, y0, x0 + dx, 16, False, slim, il, hv)
            if my:
                h_edge(ybuf, y0, x0, 16, True, mlim, il, hv)
            if sub:
                for dy in (4, 8, 12):
                    h_edge(ybuf, y0 + dy, x0, 16, False, slim, il, hv)
            if not simple:
                c0, cx0 = 1 + 8 * my, 1 + 8 * mx
                for cb in (ubuf, vbuf):
                    if mx:
                        v_edge(cb, c0, cx0, 8, True, mlim, il, hv)
                    if sub:
                        v_edge(cb, c0, cx0 + 4, 8, False, slim, il, hv)
                    if my:
                        h_edge(cb, c0, cx0, 8, True, mlim, il, hv)
                    if sub:
                        h_edge(cb, c0 + 4, cx0, 8, False, slim, il, hv)


def trebuild(debug, w, h):
    """Full-frame reconstruction from the encoder debug record, using
    only this file's reimplementations."""
    recs, dq = debug["recs"], debug["dq"]
    mb_w, mb_h = debug["mb_w"], debug["mb_h"]
    yb = np.full((1 + 16 * mb_h, 1 + 16 * mb_w + 4), 127, dtype=np.int64)
    yb[1:, 0] = 129
    ub = np.full((1 + 8 * mb_h, 1 + 8 * mb_w), 127, dtype=np.int64)
    ub[1:, 0] = 129
    vb = ub.copy()
    levels = [[0] * mb_w for _ in range(mb_h)]
    subs = [[False] * mb_w for _ in range(mb_h)]
    for my in range(mb_h):
        for mx in range(mb_w):
            rec = recs[my * mb_w + mx]
            ymode, uvmode = rec["ymode"], rec["uvmode"]
            y0, x0 = 1 + 16 * my, 1 + 16 * mx
            has = False
            if ymode != V.B_PRED:
                pred = tpred_whole(yb, y0, x0, 16, ymode, my > 0, mx > 0)
                y2d = rec["y2q"].astype(np.int64).copy()
                has = has or bool(y2d.any())
                y2d.flat[0] *= dq["y2"][0]
                y2d.flat[1:] *= dq["y2"][1]
                dcs = tiwht(y2d)
                for r in range(4):
                    for c in range(4):
                        q = rec["yq"][4 * r + c]
                        has = has or bool(q.any())
                        dqb = q.astype(np.int64) * dq["y"][1]
                        dqb[0, 0] = dcs[r, c]
                        blk = (pred[4 * r:4 * r + 4, 4 * c:4 * c + 4]
                               + tidct(dqb))
                        yb[y0 + 4 * r:y0 + 4 * r + 4,
                           x0 + 4 * c:x0 + 4 * c + 4] = np.clip(blk, 0, 255)
            else:
                for r in range(4):
                    for c in range(4):
                        yy, xx = y0 + 4 * r, x0 + 4 * c
                        above = yb[yy - 1, xx:xx + 4]
                        ar = (yb[y0 - 1, x0 + 16:x0 + 20] if c == 3
                              else yb[yy - 1, xx + 4:xx + 8])
                        left = yb[yy:yy + 4, xx - 1]
                        al = yb[yy - 1, xx - 1]
                        pred = tpredict_b(rec["bmodes"][4 * r + c], above, ar,
                                          left, al)
                        q = rec["yq"][4 * r + c]
                        has = has or bool(q.any())
                        dqb = q.astype(np.int64).copy()
                        dqb.flat[0] *= dq["y"][0]
                        dqb.flat[1:] *= dq["y"][1]
                        yb[yy:yy + 4, xx:xx + 4] = np.clip(
                            pred + tidct(dqb), 0, 255)
            c0, cx0 = 1 + 8 * my, 1 + 8 * mx
            for buf, key in ((ub, "uq"), (vb, "vq")):
                pred = tpred_whole(buf, c0, cx0, 8, uvmode, my > 0, mx > 0)
                for r in range(2):
                    for c in range(2):
                        q = rec[key][2 * r + c]
                        has = has or bool(q.any())
                        dqb = q.astype(np.int64).copy()
                        dqb.flat[0] *= dq["uv"][0]
                        dqb.flat[1:] *= dq["uv"][1]
                        blk = (pred[4 * r:4 * r + 4, 4 * c:4 * c + 4]
                               + tidct(dqb))
                        buf[c0 + 4 * r:c0 + 4 * r + 4,
                            cx0 + 4 * c:cx0 + 4 * c + 4] = np.clip(blk, 0, 255)
            levels[my][mx] = max(0, min(63, debug["filter_level"]))
            subs[my][mx] = has or ymode == V.B_PRED
        yb[y0:y0 + 16, 1 + 16 * mb_w:] = yb[y0:y0 + 16, 16 * mb_w][:, None]
    if debug["filter_level"]:
        tloop_filter(yb, ub, vb, mb_w, mb_h, levels, subs,
                     debug["filter_type"], debug["sharpness"])
    cw, ch = (w + 1) // 2, (h + 1) // 2
    return (yb[1:h + 1, 1:w + 1].astype(np.uint8),
            ub[1:ch + 1, 1:cw + 1].astype(np.uint8),
            vb[1:ch + 1, 1:cw + 1].astype(np.uint8))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_bool_coder_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        n = int(rng.integers(1, 4000))
        bits = rng.integers(0, 2, n)
        probs = rng.integers(1, 255, n)
        enc = V.BoolEncoder()
        for b, p in zip(bits, probs):
            enc.bool(int(b), int(p))
        dec = V.BoolDecoder(enc.finish())
        assert [dec.bool(int(p)) for p in probs] == list(bits)


def test_iwht_matches_matrix_form():
    rng = np.random.default_rng(1)
    for _ in range(100):
        X = rng.integers(-2000, 2000, (4, 4))
        assert np.array_equal(V.iwht4x4(X), tiwht(X))


def test_idct_matches_stagewise_form():
    rng = np.random.default_rng(2)
    for _ in range(100):
        X = rng.integers(-2000, 2000, (4, 4))
        assert np.array_equal(V.idct4x4(X), tidct(X))


def test_idct_tracks_float_dct():
    """The integer IDCT approximates the real scaled inverse DCT-II
    (basis gain 1 for DC, sqrt(2) for AC, /8 output scale)."""
    rng = np.random.default_rng(3)
    x = np.arange(4)
    B = np.array([[np.cos((2 * xx + 1) * u * np.pi / 8) for xx in x]
                  for u in range(4)])
    B[1:] *= np.sqrt(2.0)
    for _ in range(50):
        X = rng.integers(-800, 800, (4, 4)).astype(np.float64)
        want = (B.T @ X @ B) / 8.0
        got = V.idct4x4(X.astype(np.int64))
        assert np.abs(got - want).max() < 2.0


def test_b_pred_modes_match_geometric_form():
    rng = np.random.default_rng(4)
    for mode in range(10):
        for _ in range(50):
            above = rng.integers(0, 256, 4)
            aright = rng.integers(0, 256, 4)
            left = rng.integers(0, 256, 4)
            p = int(rng.integers(0, 256))
            got = V.predict_b(mode, above, aright, left, p)
            want = tpredict_b(mode, above, aright, left, p)
            assert np.array_equal(got, want), f"mode {mode}"


def test_loop_filters_match_scalar_form():
    rng = np.random.default_rng(5)
    for mb_edge in (True, False):
        for lim, il, hv in ((40, 9, 2), (10, 3, 1), (80, 1, 0)):
            seg = rng.integers(0, 256, (8, 64)).astype(np.int32)
            # include near-flat lines so the mask passes sometimes
            seg[:, :32] = 128 + rng.integers(-4, 5, (8, 32))
            got = V._normal_filter(seg.copy(), mb_edge, lim, il, hv)
            want = np.stack([
                _tnormal_px([int(t) for t in seg[:, i]], mb_edge, lim, il, hv)
                for i in range(seg.shape[1])], axis=1)
            assert np.array_equal(got, want)
    seg = rng.integers(0, 256, (4, 64)).astype(np.int32)
    seg[:, :32] = 128 + rng.integers(-4, 5, (4, 32))
    got = V._simple_filter(seg.copy(), 24)
    want = np.stack([_tsimple_px([int(t) for t in seg[:, i]], 24)
                     for i in range(seg.shape[1])], axis=1)
    assert np.array_equal(got, want)


def _mode_cycling_fixture(rng, h, w):
    img = np.kron(rng.integers(0, 256, (h // 8, w // 8, 3)),
                  np.ones((8, 8, 1))).astype(np.uint8)
    y, u, v = V.rgb_to_vp8_yuv(img)
    mbh, mbw = (h + 15) // 16, (w + 15) // 16
    ymodes = [[(r * mbw + c) % 5 for c in range(mbw)] for r in range(mbh)]
    bmodes = [[[(r * 31 + c * 7 + i) % 10 for i in range(16)]
               for c in range(mbw)] for r in range(mbh)]
    uvmodes = [[(r + c) % 4 for c in range(mbw)] for r in range(mbh)]
    return y, u, v, ymodes, bmodes, uvmodes


@pytest.mark.parametrize("flt,ftype,sharp,nparts", [
    (0, 0, 0, 1),
    (32, 0, 0, 2),
    (24, 1, 0, 1),
    (63, 0, 3, 4),
])
def test_end_to_end_twin_reconstruction(flt, ftype, sharp, nparts):
    """decode(encode(x)) must equal this file's from-scratch rebuild of
    the frame from modes + quantized coefficients — bit-exact, all mode
    families, skip MBs, token partitions and both loop filters."""
    rng = np.random.default_rng(60 + flt)
    h, w = 48, 80
    y, u, v, ym, bm, uvm = _mode_cycling_fixture(rng, h, w)
    stream, debug = V.encode_vp8(
        y, u, v, qi=35, filter_level=flt, filter_type=ftype, sharpness=sharp,
        n_partitions=nparts, ymode_map=ym, bmode_map=bm, uvmode_map=uvm,
        return_debug=True)
    dy, du, dv = V.decode_vp8_planes(stream)
    ey, eu, ev = trebuild(debug, w, h)
    assert np.array_equal(dy, ey)
    assert np.array_equal(du, eu)
    assert np.array_equal(dv, ev)


def test_end_to_end_twin_with_skip_mbs():
    """Half-flat frame: the flat MBs must take the skip path (no tokens,
    context resets) and the twin rebuild still matches bit-exactly."""
    rng = np.random.default_rng(65)
    h, w = 48, 64
    img = np.full((h, w, 3), 131, np.uint8)
    img[:16, :16] = rng.integers(0, 256, (16, 16, 3))
    y, u, v = V.rgb_to_vp8_yuv(img)
    stream, debug = V.encode_vp8(y, u, v, qi=50, filter_level=16,
                                 return_debug=True)
    assert any(r["skip"] for r in debug["recs"])
    assert not all(r["skip"] for r in debug["recs"])
    dy, du, dv = V.decode_vp8_planes(stream)
    ey, eu, ev = trebuild(debug, w, h)
    assert np.array_equal(dy, ey)
    assert np.array_equal(du, eu)
    assert np.array_equal(dv, ev)


def test_end_to_end_twin_odd_dims_and_default_modes():
    rng = np.random.default_rng(70)
    img = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    y, u, v = V.rgb_to_vp8_yuv(img)
    stream, debug = V.encode_vp8(y, u, v, qi=60, filter_level=20,
                                 return_debug=True)
    dy, du, dv = V.decode_vp8_planes(stream)
    ey, eu, ev = trebuild(debug, 53, 37)
    assert np.array_equal(dy, ey)
    assert np.array_equal(du, eu)
    assert np.array_equal(dv, ev)


def test_webp_lossy_container_roundtrip():
    from trefoil_spark.functions.webp import decode_webp

    rng = np.random.default_rng(80)
    img = np.kron(rng.integers(0, 256, (4, 5, 3)),
                  np.ones((8, 8, 1))).astype(np.uint8)
    data = V.encode_webp_lossy(img, qi=12)
    rgba = decode_webp(data)
    assert rgba.shape == (32, 40, 4)
    assert (rgba[..., 3] == 255).all()
    assert np.array_equal(rgba[..., :3], V.decode_vp8(data[20:]))
    # moderate-quality round trip stays close to the source
    assert np.abs(rgba[..., :3].astype(int) - img.astype(int)).mean() < 12


def test_malformed_vp8_raises():
    with pytest.raises(ValueError):
        V.decode_vp8_planes(b"\x00\x00")
    with pytest.raises(ValueError):
        V.decode_vp8_planes(b"\x00\x00\x00XXX\x10\x00\x10\x00")
    good = V.encode_webp_lossy(np.zeros((16, 16, 3), np.uint8))[20:]
    bad = bytes([good[0] | 1]) + good[1:]  # inter-frame flag
    with pytest.raises(NotImplementedError):
        V.decode_vp8_planes(bad)
    # first-partition length overrunning the buffer
    tag = good[0] | (good[1] << 8) | (good[2] << 16)
    big = (tag & 0x1F) | (1 << 24 - 5 << 5)
    with pytest.raises(ValueError):
        V.decode_vp8_planes(
            bytes([(tag | 0x7FFFE0) & 0xFF, 0xFF, 0x7F]) + good[3:])


def test_strict_mode_raises_distinct_error_while_placeholders_ship():
    """VERDICT r6 item 6: with the RFC 6386 default tables shipped as
    placeholders, a foreign stream desyncs SILENTLY — strict mode turns
    that hazard into a loud, distinct error (a provenance assertion:
    own-encoder streams decode with the default strict=False, anything
    of unknown origin should pass strict=True)."""
    import numpy as np
    import pytest

    from trefoil_spark.functions.vp8 import (
        TABLES_ARE_PLACEHOLDERS,
        Vp8DefaultTablesUnavailable,
        decode_vp8,
        encode_vp8,
        rgb_to_vp8_yuv,
        vp8_yuv_to_rgb,
    )
    from trefoil_spark.functions.webp import decode_webp
    from trefoil_spark.functions.vp8 import encode_webp_lossy

    assert TABLES_ARE_PLACEHOLDERS  # flip the flag when real tables land
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 48, 3), np.uint8)
    y, u, v = rgb_to_vp8_yuv(img)
    frame = encode_vp8(y, u, v, qi=30)
    # own stream, default mode: decodes (round-trip unchanged)
    assert decode_vp8(frame).shape == (32, 48, 3)
    # strict mode: the SAME bytes raise — provenance cannot be proven
    with pytest.raises(Vp8DefaultTablesUnavailable):
        decode_vp8(frame, strict=True)
    # container plumbing propagates the flag; VP8L is unaffected
    with pytest.raises(Vp8DefaultTablesUnavailable):
        decode_webp(encode_webp_lossy(img), strict_vp8=True)
