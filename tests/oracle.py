"""NumPy oracle: a direct, slow port of the reference's math for testing.

Ports the reference's projection forward (gs_model.py:277-365) and per-pixel
front-to-back compositing (gs_model.py:493-624, spec eq. 6-9) plus the
analytic gradients (gs_model.py:733-766, spec eq. 10-141) in plain float64
NumPy. Used as the allclose target for the JAX implementation on small scenes.

This is a test fixture, not product code — O(N * pixels) loops are fine.
"""

import numpy as np


def quat_to_rotmat(q):
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3), np.float64)
    R[..., 0, 0] = 1 - 2 * (qy**2 + qz**2)
    R[..., 0, 1] = 2 * (qx * qy - qw * qz)
    R[..., 0, 2] = 2 * (qx * qz + qw * qy)
    R[..., 1, 0] = 2 * (qx * qy + qw * qz)
    R[..., 1, 1] = 1 - 2 * (qx**2 + qz**2)
    R[..., 1, 2] = 2 * (qy * qz - qw * qx)
    R[..., 2, 0] = 2 * (qx * qz - qw * qy)
    R[..., 2, 1] = 2 * (qy * qz + qw * qx)
    R[..., 2, 2] = 1 - 2 * (qx**2 + qy**2)
    return R


def project_oracle(mean, quat, log_scale, P, K, z_min=1e-2):
    """Single camera. Returns dict of mean2d, sigma2d, conic, depth.

    Mirrors gs_model.py:289-353 (incl. +1e-6 I and det+1e-6 inverse).
    """
    R_wc = P[:, :3]
    t_wc = P[:, 3]
    mean_cam = mean @ R_wc.T + t_wc
    z = mean_cam[:, 2]
    homo = mean_cam @ K.T
    mean2d = homo[:, :2] / np.maximum(homo[:, 2:3], z_min)

    q = quat / np.maximum(np.linalg.norm(quat, axis=1, keepdims=True), 1e-8)
    R = quat_to_rotmat(q)
    s = np.exp(log_scale)
    S = np.zeros((len(mean), 3, 3))
    S[:, 0, 0], S[:, 1, 1], S[:, 2, 2] = s[:, 0], s[:, 1], s[:, 2]
    sigma = R @ S @ S.transpose(0, 2, 1) @ R.transpose(0, 2, 1)
    sigma_cam = R_wc[None] @ sigma @ R_wc.T[None]

    fx, fy = K[0, 0], K[1, 1]
    zc = np.maximum(z, z_min)
    J = np.zeros((len(mean), 2, 3))
    J[:, 0, 0] = fx / zc
    J[:, 0, 2] = -fx * mean_cam[:, 0] / zc**2
    J[:, 1, 1] = fy / zc
    J[:, 1, 2] = -fy * mean_cam[:, 1] / zc**2
    sigma2d = J @ sigma_cam @ J.transpose(0, 2, 1) + 1e-6 * np.eye(2)

    a = sigma2d[:, 0, 0]
    b = sigma2d[:, 0, 1]
    c = sigma2d[:, 1, 0]
    d = sigma2d[:, 1, 1]
    det = a * d - b * c + 1e-6
    conic = np.stack([d / det, -b / det, a / det], axis=-1)
    return {
        "mean_cam": mean_cam,
        "mean2d": mean2d,
        "sigma2d": sigma2d,
        "conic": conic,
        "depth": z,
    }


def composite_oracle(mean2d, conic, color, opacity, depth, W, H, pixel_offset=0.5):
    """Front-to-back composite over ALL gaussians at every pixel (no boxes).

    Implements spec eq. 6-9 exactly: per pixel, sort by depth, T = exclusive
    prod of (1 - alpha), pixel = sum T * alpha * color.
    """
    order = np.argsort(depth, kind="stable")
    img = np.zeros((H, W, 3))
    for py in range(H):
        for px in range(W):
            x = px + pixel_offset
            y = py + pixel_offset
            T = 1.0
            for g in order:
                dx = x - mean2d[g, 0]
                dy = y - mean2d[g, 1]
                a, b, c = conic[g]
                gk = np.exp(-0.5 * (a * dx * dx + 2 * b * dx * dy + c * dy * dy))
                alpha = opacity[g] * gk
                img[py, px] += T * alpha * color[g]
                T *= 1.0 - alpha
    return img


_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)


def sh_oracle(sh, dirs, deg):
    """Float64 real-SH radiance (standard 3DGS constants, degree <= 2).

    sh: (N, B, 3); dirs: (N, 3) unit view directions (the spec evaluates
    along -normalize(camera-space position), gs_model.py:335-338).
    Independent numpy port for oracle ground truth.
    """
    sh = np.asarray(sh, np.float64)
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    r = _C0 * sh[:, 0]
    if deg >= 1:
        r = (
            r
            - _C1 * y[:, None] * sh[:, 1]
            + _C1 * z[:, None] * sh[:, 2]
            - _C1 * x[:, None] * sh[:, 3]
        )
    if deg >= 2:
        xy, yz, xz = x * y, y * z, x * z
        x2, y2, z2 = x * x, y * y, z * z
        r = (
            r
            + _C2[0] * xy[:, None] * sh[:, 4]
            + _C2[1] * yz[:, None] * sh[:, 5]
            + _C2[2] * (2.0 * z2 - x2 - y2)[:, None] * sh[:, 6]
            + _C2[3] * xz[:, None] * sh[:, 7]
            + _C2[4] * (x2 - y2)[:, None] * sh[:, 8]
        )
    return r


def composite_oracle_vec(
    mean2d, conic, color, opacity, depth, W, H, pixel_offset=0.5,
    chunk=4096, z_valid=None,
):
    """Vectorized float64 composite: same spec math as composite_oracle
    (front-to-back over ALL gaussians at every pixel, no tiles, no per-tile
    truncation, no alpha floor) at usable speed for oracle ground truth.

    z_valid: optional (N,) bool — gaussians composited (e.g. depth > 0);
    invalid rows are dropped entirely (the slow oracle includes them, which
    only matches when all test gaussians are in front of the camera).
    """
    mean2d = np.asarray(mean2d, np.float64)
    conic = np.asarray(conic, np.float64)
    color = np.asarray(color, np.float64)
    opacity = np.asarray(opacity, np.float64)
    depth = np.asarray(depth, np.float64)
    if z_valid is not None:
        keep = np.asarray(z_valid, bool)
        mean2d, conic, color = mean2d[keep], conic[keep], color[keep]
        opacity, depth = opacity[keep], depth[keep]
    order = np.argsort(depth, kind="stable")
    mean2d, conic, color, opacity = (
        mean2d[order], conic[order], color[order], opacity[order]
    )
    px = np.arange(W) + pixel_offset
    py = np.arange(H) + pixel_offset
    xs, ys = np.meshgrid(px, py)  # (H, W)
    xs, ys = xs.ravel(), ys.ravel()
    img = np.zeros((H * W, 3))
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    for lo in range(0, H * W, chunk):
        x = xs[lo : lo + chunk][None, :]  # (1, P)
        y = ys[lo : lo + chunk][None, :]
        dx = x - mean2d[:, 0:1]  # (N, P)
        dy = y - mean2d[:, 1:2]
        gk = np.exp(
            -0.5
            * (a[:, None] * dx * dx + 2 * b[:, None] * dx * dy
               + c[:, None] * dy * dy)
        )
        alpha = opacity[:, None] * gk  # (N, P) in depth order
        T = np.cumprod(1.0 - alpha, axis=0)
        T_excl = np.concatenate([np.ones((1, alpha.shape[1])), T[:-1]], axis=0)
        w = T_excl * alpha  # (N, P)
        img[lo : lo + chunk] = w.T @ color  # (P, 3)
    return img.reshape(H, W, 3)


def composite_oracle_windowed(
    mean2d, conic, color, opacity, depth, W, H, pixel_offset=0.5,
    window_sigma=7.0, block=16, z_valid=None,
):
    """Float64 composite with per-gaussian elliptical windows (fast oracle).

    Identical spec math to composite_oracle_vec, except each gaussian is only
    evaluated inside the bounding box of its ``window_sigma``-sigma level set
    of the evaluated quadratic q = d^T conic d (for q = a dx^2 + 2b dx dy +
    c dy^2 the box half-extents are r*sqrt(c/det), r*sqrt(a/det)).  Excluded
    terms contribute alpha < exp(-window_sigma^2 / 2) (= 2.3e-11 at 7 sigma),
    so agreement with the unwindowed oracle is far beyond f32 PSNR scales —
    asserted by tests/test_oracle_fast.py.  Needed because oracle ground
    truth at O(100k) gaussians is O(N * W * H) unwindowed (hours on the 2
    CPU cores here); windowed it is O(sum of box areas).

    Gaussians whose conic is not positive definite (det <= 0 — cannot happen
    for well-conditioned GT models; the production path gates them to zero,
    ops/rasterize) fall back to the full image window.
    """
    mean2d = np.asarray(mean2d, np.float64)
    conic = np.asarray(conic, np.float64)
    color = np.asarray(color, np.float64)
    opacity = np.asarray(opacity, np.float64)
    depth = np.asarray(depth, np.float64)
    if z_valid is not None:
        keep = np.asarray(z_valid, bool)
        mean2d, conic, color = mean2d[keep], conic[keep], color[keep]
        opacity, depth = opacity[keep], depth[keep]
    order = np.argsort(depth, kind="stable")
    mean2d, conic, color, opacity = (
        mean2d[order], conic[order], color[order], opacity[order]
    )
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    det = a * c - b * b
    psd = det > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        rx = np.where(psd, window_sigma * np.sqrt(np.abs(c) / np.abs(det)), W)
        ry = np.where(psd, window_sigma * np.sqrt(np.abs(a) / np.abs(det)), H)
    x_lo, x_hi = mean2d[:, 0] - rx, mean2d[:, 0] + rx
    y_lo, y_hi = mean2d[:, 1] - ry, mean2d[:, 1] + ry

    img = np.zeros((H, W, 3))
    ones_T = None
    for by in range(0, H, block):
        for bx in range(0, W, block):
            bw = min(block, W - bx)
            bh = min(block, H - by)
            # pixel centers of this block
            px = bx + pixel_offset + np.arange(bw)
            py = by + pixel_offset + np.arange(bh)
            sel = (
                (x_hi >= px[0]) & (x_lo <= px[-1])
                & (y_hi >= py[0]) & (y_lo <= py[-1])
            )
            if not sel.any():
                continue
            idx = np.nonzero(sel)[0]  # ascending = depth order preserved
            xs, ys = np.meshgrid(px, py)
            xs, ys = xs.ravel()[None, :], ys.ravel()[None, :]
            dx = xs - mean2d[idx, 0:1]  # (M, P)
            dy = ys - mean2d[idx, 1:2]
            q = (
                a[idx, None] * dx * dx + 2 * b[idx, None] * dx * dy
                + c[idx, None] * dy * dy
            )
            # evaluate exp only inside each gaussian's window ellipse — the
            # quadratic is cheap (fused mul/add) but the dense exp dominated
            # the oracle's runtime; outside-window terms are exactly the
            # ones the windowing already excludes (q > window_sigma^2)
            gk = np.zeros_like(q)
            inside = q < window_sigma * window_sigma
            gk[inside] = np.exp(-0.5 * q[inside])
            alpha = opacity[idx, None] * gk
            T = np.cumprod(1.0 - alpha, axis=0)
            T_excl = np.concatenate(
                [np.ones((1, alpha.shape[1])), T[:-1]], axis=0
            )
            w = T_excl * alpha
            img[by : by + bh, bx : bx + bw] = (w.T @ color[idx]).reshape(
                bh, bw, 3
            )
    return img


def composite_oracle_tilesupport(
    mean2d, conic, color, opacity, depth, W, H, bw, bh,
    tile_size=16, pixel_offset=0.5, z_valid=None,
):
    """Float64 composite over the PRODUCTION rasterizer's support.

    Same spec math as composite_oracle_vec, but each gaussian is evaluated
    exactly on the pixels the production binning assigns it: the tiles
    ``floor((mu - b)/ts) .. floor((mu + b)/ts)`` (clipped to the ceil tile
    grid; ops/binning.py:133-136) of its 3-sigma axis-aligned box ``(bw,
    bh)`` (capped, ops/projection.py:234-237), with the FULL Gaussian value
    inside those tiles (no radial cutoff — the production kernels evaluate
    exp everywhere in the tile). Support is part of the 3DGS model family's
    semantics (official 3DGS rasterizes ceil(3 sigma) rects at tile
    granularity; the reference expands 3-sigma boxes, gs_model.py:332):
    synthetic ground truth rendered on a much wider support (e.g. 7-sigma
    windows) contains stacked far-tail mass that NO rect-based rasterizer
    reproduces — at degenerate views (camera inside a gaussian cloud) the
    r4 courtyard GT's 0.01<z<4 cohort summed to an opaque veil that capped
    fit PSNR at ~10 dB. The compositing itself stays float64 and
    independent of the production code.

    Culling matches ops/projection.py:256-264: callers pass ``z_valid`` =
    (z > 0) & box-intersects-screen & (bw > 0).
    """
    mean2d = np.asarray(mean2d, np.float64)
    conic = np.asarray(conic, np.float64)
    color = np.asarray(color, np.float64)
    opacity = np.asarray(opacity, np.float64)
    depth = np.asarray(depth, np.float64)
    bw = np.asarray(bw, np.float64)
    bh = np.asarray(bh, np.float64)
    if z_valid is not None:
        keep = np.asarray(z_valid, bool)
        mean2d, conic, color = mean2d[keep], conic[keep], color[keep]
        opacity, depth = opacity[keep], depth[keep]
        bw, bh = bw[keep], bh[keep]
    order = np.argsort(depth, kind="stable")
    mean2d, conic, color, opacity, bw, bh = (
        mean2d[order], conic[order], color[order], opacity[order],
        bw[order], bh[order],
    )
    ts = tile_size
    ntx, nty = -(-W // ts), -(-H // ts)
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    tx0 = np.clip(np.floor((mean2d[:, 0] - bw) / ts), 0, ntx - 1)
    tx1 = np.clip(np.floor((mean2d[:, 0] + bw) / ts), 0, ntx - 1)
    ty0 = np.clip(np.floor((mean2d[:, 1] - bh) / ts), 0, nty - 1)
    ty1 = np.clip(np.floor((mean2d[:, 1] + bh) / ts), 0, nty - 1)

    img = np.zeros((H, W, 3))
    for tyi in range(nty):
        for txi in range(ntx):
            sel = (tx0 <= txi) & (txi <= tx1) & (ty0 <= tyi) & (tyi <= ty1)
            if not sel.any():
                continue
            bx, by = txi * ts, tyi * ts
            pw = min(ts, W - bx)
            ph = min(ts, H - by)
            px = bx + pixel_offset + np.arange(pw)
            py = by + pixel_offset + np.arange(ph)
            idx = np.nonzero(sel)[0]  # ascending = depth order preserved
            xs, ys = np.meshgrid(px, py)
            xs, ys = xs.ravel()[None, :], ys.ravel()[None, :]
            dx = xs - mean2d[idx, 0:1]  # (M, P)
            dy = ys - mean2d[idx, 1:2]
            q = (
                a[idx, None] * dx * dx + 2 * b[idx, None] * dx * dy
                + c[idx, None] * dy * dy
            )
            gk = np.where(q >= 0.0, np.exp(-0.5 * np.maximum(q, 0.0)), 0.0)
            alpha = opacity[idx, None] * gk
            T = np.cumprod(1.0 - alpha, axis=0)
            T_excl = np.concatenate(
                [np.ones((1, alpha.shape[1])), T[:-1]], axis=0
            )
            w = T_excl * alpha
            img[by : by + ph, bx : bx + pw] = (w.T @ color[idx]).reshape(
                ph, pw, 3
            )
    return img


def render_oracle(model_np, P, K, W, H, sh_degree=2, window_sigma=None,
                  block=16, support="sigma", bbox_max_frac=0.4,
                  tile_size=16):
    """Full-frame float64 oracle render of a GaussianModel's alive rows.

    support="sigma" (default): window_sigma elliptical windows / dense —
    the exact continuous-math composite. support="prod": the production
    rasterizer's support definition (3-sigma capped boxes at tile
    granularity, composite_oracle_tilesupport) with f64 exact compositing —
    use for synthetic GT that the 3DGS model family can actually fit.

    model_np: dict of numpy arrays {mean (N,3), quat (N,4), log_scale (N,3),
    opacity (N,), sh (N, B, 3)} — row-major natural units (opacity already
    sigmoided). Projection per project_oracle (the reference's math), color
    via sh_oracle along -normalize(camera-space position), compositing via
    composite_oracle_vec over all z > 0 gaussians. Completely independent of
    the production JAX path: float64, no tiling, no per-tile K, no culling.

    window_sigma: None = exact unwindowed composite; a float (e.g. 7.0)
    switches to composite_oracle_windowed (identical math inside each
    gaussian's window_sigma-sigma ellipse box; per-term error < exp(-w^2/2))
    for oracle GT at scales where the dense composite is intractable."""
    pr = project_oracle(
        model_np["mean"], model_np["quat"], model_np["log_scale"], P, K
    )
    cam = pr["mean_cam"]
    d = -cam / np.maximum(np.linalg.norm(cam, axis=1, keepdims=True), 1e-12)
    color = sh_oracle(model_np["sh"], d, sh_degree)
    if support == "prod":
        # production-support oracle (composite_oracle_tilesupport): 3-sigma
        # capped boxes -> tile spans, the culling of ops/projection.py:256,
        # f64 exact compositing inside
        s2 = pr["sigma2d"]
        cap = bbox_max_frac * np.sqrt(float(W * H))
        bw = np.minimum(3.0 * np.sqrt(np.abs(s2[:, 0, 0])), cap)
        bh = np.minimum(3.0 * np.sqrt(np.abs(s2[:, 1, 1])), cap)
        px, py = pr["mean2d"][:, 0], pr["mean2d"][:, 1]
        z = pr["depth"]
        valid = (
            (z > 0) & (px - bw < W) & (px + bw > 0)
            & (py - bh < H) & (py + bh > 0) & (bw > 0)
        )
        return composite_oracle_tilesupport(
            pr["mean2d"], pr["conic"], color, model_np["opacity"],
            z, W, H, bw, bh, tile_size=tile_size, z_valid=valid,
        )
    if window_sigma is not None:
        return composite_oracle_windowed(
            pr["mean2d"], pr["conic"], color, model_np["opacity"],
            pr["depth"], W, H, window_sigma=window_sigma, block=block,
            z_valid=pr["depth"] > 1e-2,
        )
    return composite_oracle_vec(
        pr["mean2d"], pr["conic"], color, model_np["opacity"], pr["depth"],
        W, H, z_valid=pr["depth"] > 1e-2,
    )


def composite_grads_oracle(
    mean2d, conic, color, opacity, depth, W, H, g_img, pixel_offset=0.5
):
    """Analytic parameter gradients, spec eq. 10-141 (corrected dL/dl).

    Returns dict with g_mean2d (N,2), g_conic (N,3 packed a,b,c),
    g_color (N,3), g_opacity (N,).
    """
    N = len(mean2d)
    order = np.argsort(depth, kind="stable")
    g_mu = np.zeros((N, 2))
    g_con = np.zeros((N, 3))
    g_col = np.zeros((N, 3))
    g_op = np.zeros((N,))
    for py in range(H):
        for px in range(W):
            x = px + pixel_offset
            y = py + pixel_offset
            gI = g_img[py, px]  # (3,)
            # forward quantities per depth slot
            alphas, gks, dxs, dys = [], [], [], []
            for g in order:
                dx = x - mean2d[g, 0]
                dy = y - mean2d[g, 1]
                a, b, c = conic[g]
                gk = np.exp(-0.5 * (a * dx * dx + 2 * b * dx * dy + c * dy * dy))
                alphas.append(opacity[g] * gk)
                gks.append(gk)
                dxs.append(dx)
                dys.append(dy)
            alphas = np.array(alphas)
            T_excl = np.concatenate([[1.0], np.cumprod(1 - alphas)[:-1]])
            w = np.array(
                [
                    gI @ (T_excl[k] * alphas[k] * color[order[k]])
                    for k in range(len(order))
                ]
            )
            suffix = np.concatenate([np.cumsum(w[::-1])[::-1][1:], [0.0]])
            for k, g in enumerate(order):
                a, b, c = conic[g]
                ck = gI @ color[g]
                u = T_excl[k] * ck - suffix[k] / max(1 - alphas[k], 1e-8)
                gk = gks[k]
                dx, dy = dxs[k], dys[k]
                g_op[g] += gk * u
                g_col[g] += gI * T_excl[k] * alphas[k]
                m = opacity[g] * u * gk
                g_mu[g, 0] += m * (a * dx + b * dy)
                g_mu[g, 1] += m * (b * dx + c * dy)
                g_con[g, 0] += -0.5 * m * dx * dx
                g_con[g, 1] += -m * dx * dy
                g_con[g, 2] += -0.5 * m * dy * dy
    return {"g_mean2d": g_mu, "g_conic": g_con, "g_color": g_col, "g_opacity": g_op}
