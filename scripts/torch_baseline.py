#!/usr/bin/env python
"""PyTorch baseline workload measurement.

The reference repo publishes no benchmark numbers (BASELINE.md), and its
training stack cannot be imported here (hydra/attrdictionary are not
installed).  This script independently implements the reference's
PER-EPOCH COMPUTATIONAL WORKLOAD for the GP-AL-1D recipe
(reference: README.md:35, train_aline.py:53-152) in plain PyTorch, with the
same algorithmic structure the reference uses:

* GP batch sampling with a PYTHON LOOP of per-element Cholesky
  factorizations (reference: tasks/gaussian_process.py:366-417),
* a T-step Python rollout that re-builds the attention mask every step and
  re-concatenates the shrinking query pool / growing context
  (reference: train_aline.py:80-110, model/encoder.py:83-126,139,
   tasks/base_task.py:103-154),
* the efficient two-attention block decomposition
  (reference: model/encoder.py:7-46),
* 10 independent GMM component MLPs, acquisition softmax + Categorical,
* REINFORCE + prediction loss, backward, inf-norm clip, AdamW step.

Run:  python scripts/torch_baseline.py [--epochs 5] [--device cpu]
Writes benchmarks/baseline_torch.json with rollouts/sec.
"""
import argparse
import json
import math
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

torch.manual_seed(0)


# --------------------------------------------------------------------- tasks
class GPSampler:
    """GP-AL-1D batch sampling with the reference's per-element loop."""

    def __init__(self, dim_x=1, n_ctx=1, n_query=200, n_target=100,
                 design_scale=5.0, noise=0.01, jitter=1e-5):
        self.dim_x, self.n_ctx = dim_x, n_ctx
        self.n_query, self.n_target = n_query, n_target
        self.scale, self.noise, self.jitter = design_scale, noise, jitter

    def sample(self, B):
        ls = 0.1 + 1.9 * torch.rand(B, self.dim_x)
        iso = torch.rand(B) < 0.5
        ls[iso] = ls[iso, :1]
        out_scale = 0.1 + 0.9 * torch.rand(B)
        theta = torch.cat([ls, out_scale[:, None]], 1)[..., None]  # [B,2,1]

        n_total = self.n_ctx + self.n_query + self.n_target
        x = torch.rand(B, n_total, self.dim_x) * 2 * self.scale - self.scale
        y = torch.zeros(B, n_total, 1)
        kernels = torch.multinomial(
            torch.tensor([1 / 3, 0.0, 1 / 3, 1 / 3]), B, replacement=True)
        for b in range(B):  # the reference's per-element hot loop
            d = (x[b, :, None, :] - x[b, None, :, :]) / ls[b]
            d2 = (d * d).sum(-1)
            r = d2.clamp_min(0).sqrt()
            k = kernels[b].item()
            if k == 0:
                K = torch.exp(-0.5 * d2)
            elif k == 1:
                K = torch.exp(-r)
            elif k == 2:
                K = (1 + math.sqrt(3) * r) * torch.exp(-math.sqrt(3) * r)
            else:
                K = (1 + math.sqrt(5) * r + 5 / 3 * d2) * torch.exp(
                    -math.sqrt(5) * r)
            K = out_scale[b] * K + self.jitter * torch.eye(n_total)
            L = torch.linalg.cholesky(K)
            f = L @ torch.randn(n_total)
            y[b, :, 0] = f + self.noise * torch.randn(n_total)
        return theta, x, y


# --------------------------------------------------------------------- model
class EfficientLayer(nn.Module):
    """Two-attention block decomposition + post-norm FF."""

    def __init__(self, d, heads, ff):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, heads, batch_first=True)
        self.l1, self.l2 = nn.Linear(d, ff), nn.Linear(ff, d)
        self.n1, self.n2 = nn.LayerNorm(d), nn.LayerNorm(d)

    def forward(self, x, mask, n_ctx):
        ctx, rest = x[:, :n_ctx], x[:, n_ctx:]
        ctx_out = self.attn(ctx, ctx, ctx, need_weights=False)[0]
        rest_out = self.attn(rest, x, x, attn_mask=mask[n_ctx:],
                             need_weights=False)[0]
        sa = torch.cat([ctx_out, rest_out], 1)
        x = self.n1(x + sa)
        return self.n2(x + self.l2(F.relu(self.l1(x))))


class TorchAline(nn.Module):
    def __init__(self, dim_x=1, d=32, ff=128, heads=4, layers=3, C=10,
                 n_theta=2):
        super().__init__()
        self.x_emb = nn.Sequential(nn.Linear(dim_x, ff), nn.ReLU(),
                                   nn.Linear(ff, d))
        self.y_emb = nn.Sequential(nn.Linear(1, ff), nn.ReLU(),
                                   nn.Linear(ff, d))
        self.theta_tokens = nn.Parameter(torch.randn(n_theta, d))
        self.layers = nn.ModuleList(
            [EfficientLayer(d, heads, ff) for _ in range(layers)])
        self.acq = nn.Sequential(nn.Linear(d, ff), nn.ReLU(),
                                 nn.Linear(ff, 1))
        self.gmm = nn.ModuleList([
            nn.Sequential(nn.Linear(d, ff), nn.ReLU(), nn.Linear(ff, 3))
            for _ in range(C)])

    def gmm_params(self, z):
        outs = torch.stack([h(z) for h in self.gmm], -1)  # [B,N,3,C]
        mean, raw_std, raw_w = outs[..., 0, :], outs[..., 1, :], \
            outs[..., 2, :]
        return mean, F.softplus(raw_std) + 1e-4, F.softmax(raw_w, -1)

    def forward(self, ctx_x, ctx_y, qry_x, tgt_x, target_mask):
        B = ctx_x.shape[0]
        n_ctx, n_qry, n_tgt_x = ctx_x.shape[1], qry_x.shape[1], tgt_x.shape[1]
        n_theta = self.theta_tokens.shape[0]
        tokens = torch.cat([
            self.x_emb(ctx_x) + self.y_emb(ctx_y),
            self.x_emb(qry_x),
            self.x_emb(tgt_x),
            self.theta_tokens.expand(B, -1, -1)], 1)
        n_all = tokens.shape[1]
        # rebuild the mask every step like the reference
        mask = torch.full((n_all, n_all), float("-inf"))
        mask[:, :n_ctx] = 0.0
        sel = torch.where(target_mask)[0] + n_ctx + n_qry
        mask[n_ctx:n_ctx + n_qry, sel] = 0.0
        z = tokens
        for layer in self.layers:
            z = layer(z, mask, n_ctx)
        z_qry = z[:, n_ctx:n_ctx + n_qry]
        z_tgt = z[:, n_ctx + n_qry:]
        probs = F.softmax(self.acq(z_qry)[..., 0], -1)
        m = torch.distributions.Categorical(probs)
        idx = m.sample()
        log_prob = m.log_prob(idx)
        return idx, log_prob, self.gmm_params(z_tgt), self.gmm_params(z_qry)


def gmm_ll(v, mean, std, w):
    lp = torch.distributions.Normal(mean, std).log_prob(v[..., None])
    return torch.logsumexp(lp + torch.log(w), -1)


def run_epoch(model, opt, sampler, B, T, n_tgt_data, n_theta):
    theta, x, y = sampler.sample(B)
    n_ctx0 = sampler.n_ctx
    ctx_x, ctx_y = x[:, :n_ctx0], y[:, :n_ctx0]
    qry_x = x[:, n_ctx0:n_ctx0 + sampler.n_query]
    qry_y = y[:, n_ctx0:n_ctx0 + sampler.n_query]
    tgt_x = x[:, n_ctx0 + sampler.n_query:]
    tgt_y = y[:, n_ctx0 + sampler.n_query:]
    target_all = torch.cat([tgt_y, theta], 1)[..., 0]   # [B, 102]
    # split-mode mask: attend to data
    tmask = torch.zeros(n_tgt_data + n_theta, dtype=torch.bool)
    tmask[:n_tgt_data] = True

    log_probs, nll_q, nll_p = [], [], []
    for t in range(T):
        idx, lp, (m_t, s_t, w_t), _ = model(ctx_x, ctx_y, qry_x, tgt_x,
                                            tmask)
        # update_batch: gather chosen, delete from pool, append to context
        bsel = torch.arange(B)
        nx = qry_x[bsel, idx][:, None]
        ny = qry_y[bsel, idx][:, None]
        keep = torch.ones(B, qry_x.shape[1], dtype=torch.bool)
        keep[bsel, idx] = False
        qry_x = qry_x[keep].view(B, -1, qry_x.shape[-1])
        qry_y = qry_y[keep].view(B, -1, 1)
        ctx_x = torch.cat([ctx_x, nx], 1)
        ctx_y = torch.cat([ctx_y, ny], 1)
        ll = gmm_ll(target_all, m_t, s_t, w_t)           # [B, 102]
        masked = ll[:, tmask]
        nll_q.append(-masked.mean(-1))
        nll_p.append(-(ll[:, :n_tgt_data].mean(-1)
                       + ll[:, n_tgt_data:].mean(-1)))
        log_probs.append(lp)

    log_probs = torch.stack(log_probs, 1)
    R = []
    for t in range(1, T):
        R.append(torch.clamp(nll_q[t - 1] - nll_q[t], min=0).detach())
    R = torch.stack(R, 1)
    R = (R - R.mean(0, keepdim=True)) / (R.std(0, keepdim=True) + 1e-9)
    loss = -torch.mean(log_probs[:, :-1] * R) + torch.mean(
        torch.stack(nll_p))
    opt.zero_grad()
    loss.backward()
    torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0,
                                   norm_type=float("inf"))
    opt.step()
    return float(loss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=200)
    ap.add_argument("--T", type=int, default=30)
    ap.add_argument("--device", default="cpu")
    args = ap.parse_args()

    torch.set_default_device(args.device)
    sampler = GPSampler()
    model = TorchAline()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)

    for _ in range(args.warmup):
        run_epoch(model, opt, sampler, args.batch_size, args.T, 100, 2)
    t0 = time.perf_counter()
    for _ in range(args.epochs):
        run_epoch(model, opt, sampler, args.batch_size, args.T, 100, 2)
    dt = time.perf_counter() - t0
    per_epoch = dt / args.epochs
    rollouts_per_sec = args.batch_size / per_epoch

    result = {
        "metric": "design rollouts/sec (GP-AL-1D, T=30, B=200)",
        "value": rollouts_per_sec,
        "sec_per_epoch": per_epoch,
        "device": args.device,
        "torch": torch.__version__,
        "note": ("independent reimplementation of the reference per-epoch "
                 "workload (train_aline.py GP-AL-1D recipe); reference "
                 "deps not installable here"),
    }
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/baseline_torch.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
