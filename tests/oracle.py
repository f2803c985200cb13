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
