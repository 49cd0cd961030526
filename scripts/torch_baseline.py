"""Torch-CPU baseline: one full SGLD registration transition at 128^3.

The reference publishes no benchmark numbers (BASELINE.md), so the anchor is
measured: this is an independent torch implementation of the same transition
op-chain the reference executes per MCMC step (SURVEY.md §3.3) — Langevin
noise, Sobolev smoothing, 12-step scaling-and-squaring, uniform-noise warp,
LCC residuals, virtual decimation (inner backward), detached GMM Adam step,
GMM+reg loss, backward, preconditioned update — written against torch's
public API (no reference code).
"""

from __future__ import annotations

import math
import time

import numpy as np
import torch
import torch.nn.functional as F


def identity_grid(dims):
    D, H, W = dims
    z = torch.linspace(-1, 1, D)
    y = torch.linspace(-1, 1, H)
    x = torch.linspace(-1, 1, W)
    zz, yy, xx = torch.meshgrid(z, y, x, indexing="ij")
    return torch.stack([xx, yy, zz], dim=-1)[None]  # (1, D, H, W, 3)


def vox_to_norm(field):
    # channel 0 -> W, 1 -> H, 2 -> D
    _, _, D, H, W = field.shape
    s = torch.tensor([2.0 / (W - 1), 2.0 / (H - 1), 2.0 / (D - 1)]).view(1, 3, 1, 1, 1)
    return field * s


def svf_exp(v, id_grid, steps=12):
    disp = vox_to_norm(v) / float(2**steps)
    for _ in range(steps):
        grid = id_grid + disp.permute(0, 2, 3, 4, 1)
        disp = disp + F.grid_sample(disp, grid, padding_mode="border", align_corners=True)
    return id_grid.permute(0, 4, 1, 2, 3) + disp


def sobolev_kernel(s=3, lam=0.5):
    n = 2 * s + 1
    L = np.diag(-2.0 * np.ones(n)) + np.diag(np.ones(n - 1), 1) + np.diag(np.ones(n - 1), -1)
    w, V = np.linalg.eigh(L)
    k = (V * (1.0 / (1.0 - lam * w))) @ V[s]
    return torch.tensor(k / k.sum(), dtype=torch.float32)


def smooth3(v, k):
    taps = k.numel()
    p = taps // 2
    kz = k.view(1, 1, taps, 1, 1).repeat(3, 1, 1, 1, 1)
    ky = k.view(1, 1, 1, taps, 1).repeat(3, 1, 1, 1, 1)
    kx = k.view(1, 1, 1, 1, taps).repeat(3, 1, 1, 1, 1)
    v = F.pad(v, (p, p, p, p, p, p), mode="replicate")
    v = F.conv3d(v, kz, groups=3)
    v = F.conv3d(v, ky, groups=3)
    v = F.conv3d(v, kx, groups=3)
    return v


def lcc_residuals(f, m, radius=1):
    k = torch.ones(1, 1, 2 * radius + 1, 2 * radius + 1, 2 * radius + 1)
    n = float(k.numel())

    def lcn(im):
        imp = F.pad(im, (radius,) * 6, mode="replicate")
        mu = F.conv3d(imp, k) / n
        var = F.conv3d(F.pad((im - mu) ** 2, (radius,) * 6, mode="replicate"), k) / n
        return (im - mu) / torch.sqrt(var + 1e-10)

    return lcn(f) - lcn(m)


def gmm_nll(res, logits, log_std):
    log_p = F.log_softmax(logits + 1e-2, 0) - log_std - 0.5 * math.log(2 * math.pi)
    z = res.reshape(-1, 1) * torch.exp(-log_std)
    return -torch.logsumexp(log_p - 0.5 * z**2, dim=-1).sum()


def vd_alpha(res, logits, log_std):
    with torch.enable_grad():
        z = (res.reshape(-1, 1).detach() * torch.exp(-log_std.detach())).requires_grad_(True)
        log_p = F.log_softmax(logits.detach() + 1e-2, 0) - log_std.detach() - 0.5 * math.log(2 * math.pi)
        loss = -torch.logsumexp(log_p - 0.5 * z**2, dim=-1).sum()
        (g,) = torch.autograd.grad(loss, z)
        rescaled = (z * g).sum(-1).view(res.shape)
    var = rescaled.pow(2).mean()
    n = rescaled.numel()

    def corr(a, b):
        return (a * b).sum() / n / var

    out = 1.0
    for ax in (2, 3, 4):
        sl1 = [slice(None)] * 5
        sl2 = [slice(None)] * 5
        sl1[ax] = slice(None, -1)
        sl2[ax] = slice(1, None)
        c = corr(rescaled[tuple(sl1)], rescaled[tuple(sl2)]).clamp_min(1e-12)
        out = out * (-2.0 / math.pi * torch.log(c)).clamp(max=1.0)
    return out.sqrt().detach()


def reg_energy(v):
    dx = v[..., 1:] - v[..., :-1]
    dy = v[..., 1:, :] - v[..., :-1, :]
    dz = v[..., 1:, :, :] - v[..., :-1, :, :]
    return sum((d**2).sum() for d in (dx, dy, dz))


def run_baseline(dims=(128, 128, 128), chains=2, warmup=3, timed=20, sgld_steps=1):
    torch.manual_seed(0)
    torch.set_num_threads(torch.get_num_threads())

    D, H, W = dims
    fixed = torch.rand(chains, 1, D, H, W)
    moving = torch.rand(chains, 1, D, H, W)
    id_grid = identity_grid(dims)
    k = sobolev_kernel()

    v = torch.zeros(chains, 3, D, H, W)
    sigma = torch.ones_like(v)
    tau = 1e-5
    logits = torch.zeros(4, requires_grad=True)
    log_std = torch.zeros(4, requires_grad=True)
    loc = torch.tensor(10.0, requires_grad=True)
    log_scale = torch.tensor(2.0, requires_grad=True)
    opt_gmm = torch.optim.Adam([logits, log_std], lr=0.2)
    opt_reg = torch.optim.Adam([loc, log_scale], lr=0.01)
    dof = 3.0 * D * H * W

    def transition(v):
        v_noised = (v + math.sqrt(2 * tau) * sigma * torch.randn_like(v)).requires_grad_(True)
        v_s = smooth3(v_noised, k)
        T = svf_exp(v_s, id_grid.expand(chains, -1, -1, -1, -1))
        T_n = T + vox_to_norm(torch.rand_like(v) * 0.2 - 0.1)
        warped = F.grid_sample(moving, T_n.permute(0, 2, 3, 4, 1), padding_mode="border", align_corners=True)
        res = lcc_residuals(fixed, warped)

        data = 0.0
        for c in range(chains):
            alpha = vd_alpha(res[c : c + 1], logits, log_std)
            # detached GMM step
            opt_gmm.zero_grad()
            gl = gmm_nll(res[c].detach(), logits, log_std) * alpha
            gl.backward()
            opt_gmm.step()
            data = data + gmm_nll(res[c], logits, log_std) * alpha

        y = torch.stack([reg_energy(v_s[c]) for c in range(chains)])
        log_y = y.log()
        reg = (log_y + log_scale + 0.5 * ((log_y - loc) / log_scale.exp()) ** 2).sum()
        reg = reg + ((0.5 * dof - 1.0) * log_y).sum()

        loss = data + reg
        opt_reg.zero_grad()
        loss.backward()
        opt_reg.step()
        with torch.no_grad():
            return v_noised - tau * sigma**2 * v_noised.grad

    for _ in range(warmup):
        v = transition(v)
    times = []
    for _ in range(timed):
        t0 = time.perf_counter()
        v = transition(v)
        times.append(time.perf_counter() - t0)
    # median + IQR: early-run allocator noise made small-sample mean anchors
    # swing ±2× (round-2's 5-transition anchor had (max−min)/mean = 157%);
    # the headline multiplier divides by the median per-transition time
    med = float(np.median(times))
    q1, q3 = (float(q) for q in np.percentile(times, [25, 75]))
    total = sum(times)
    mean = total / timed
    return {
        "samples_per_sec": chains / med,
        "samples_per_sec_mean": chains * timed / total,
        "timed_transitions": timed,
        "warmup_transitions": warmup,
        "per_transition_s": [round(t, 3) for t in times],
        "median_s": round(med, 3),
        "iqr_s": round(q3 - q1, 3),
        "spread_rel": (q3 - q1) / med,
        "minmax_spread_rel": (max(times) - min(times)) / mean,
        "std_rel": (sum((t - mean) ** 2 for t in times) / timed) ** 0.5 / mean,
    }


if __name__ == "__main__":
    import json

    print(json.dumps(run_baseline()))
