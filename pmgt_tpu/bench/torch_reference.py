"""Reference-equivalent PyTorch baseline for throughput comparison.

This is a from-scratch reimplementation of the reference's *training
pipeline shape* (not a code copy): host-side Python MCN sampling per node
(reference pmgt/pmgt/datasets.py:14-53), a torch PMGT encoder with dual
attention (modeling_pmgt.py:420-534), and the per-sample Python loop of
encoder passes for the GSR loss (models.py:104-127). It exists so
``bench.py`` can report a measured ``vs_baseline`` ratio on this machine
rather than an invented constant.

Runs on CPU (the only torch device here); the reference itself ran on one
CUDA GPU, so treat the ratio as indicative, not a GPU-parity claim.
"""
from __future__ import annotations

import math
import time
from collections import Counter, defaultdict
from typing import Dict, List, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ----------------------------------------------------------------------
# host-side sampler (reference datasets.py semantics)
# ----------------------------------------------------------------------

class HostGraph:
    def __init__(self, nbr_ids: np.ndarray, nbr_logits: np.ndarray, degrees: np.ndarray):
        self.adj: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        n = nbr_ids.shape[0]
        for node in range(2, n):
            d = int(degrees[node])
            if d == 0:
                self.adj[node] = (np.empty(0, np.int64), np.empty(0))
                continue
            ids = nbr_ids[node, :d].astype(np.int64)
            w = nbr_logits[node, :d].astype(np.float64)
            w = np.exp(w - w.max())
            self.adj[node] = (ids, w / w.sum())
        self.num_nodes = n - 2


def sample_context_host(
    graph: HostGraph, target: int, hops: List[int], max_ctx: int
) -> Tuple[List[int], int]:
    scores: Dict[int, float] = defaultdict(float)
    depth = len(hops)
    frontier = [target]
    for k, size in enumerate(hops, start=1):
        nxt: List[int] = []
        for node in frontier:
            ids, probs = graph.adj.get(node, (np.empty(0, np.int64), None))
            if len(ids) == 0:
                continue
            nxt.extend(np.random.choice(ids, size=size, replace=True, p=probs).tolist())
        for node, freq in Counter(nxt).items():
            if node != target:
                scores[node] += freq * (depth - k + 1)
        frontier = nxt
    ctx = [n for n, _ in sorted(scores.items(), key=lambda kv: kv[1], reverse=True)]
    num_ctx = min(len(ctx), max_ctx)
    ctx = (ctx + [0] * max_ctx)[:max_ctx]
    return [target] + ctx, num_ctx


# ----------------------------------------------------------------------
# torch dual-attention encoder (reference modeling_pmgt.py semantics)
# ----------------------------------------------------------------------

class TorchDualAttention(nn.Module):
    def __init__(self, hidden, heads, beta, dropout):
        super().__init__()
        self.h, self.d = heads, hidden // heads
        self.beta = beta
        self.q = nn.Linear(hidden, hidden)
        self.k = nn.Linear(hidden, hidden)
        self.v = nn.Linear(hidden, hidden)
        self.c = nn.Linear(hidden, hidden)
        self.drop = nn.Dropout(dropout)

    def _split(self, x):
        b, s, _ = x.shape
        return x.view(b, s, self.h, self.d).permute(0, 2, 1, 3)

    def forward(self, x, add_mask, head_mask=None, output_attentions=False):
        q, k, v, c = (self._split(m(x)) for m in (self.q, self.k, self.v, self.c))
        s = x.size(1)
        norm = torch.linalg.norm(c, dim=-1, keepdim=True)
        cos = (c @ c.transpose(-1, -2)) / (norm @ norm.transpose(-1, -2)).clamp_min(1e-12)
        eye = torch.eye(s, dtype=x.dtype).view(1, 1, s, s)
        s1 = 1.0 - cos + eye + add_mask
        p1 = self.drop(s1.softmax(-1))
        s2 = (q @ k.transpose(-1, -2)) / math.sqrt(self.d) + add_mask
        p2 = self.drop(s2.softmax(-1))
        if head_mask is not None:
            # post-dropout, both distributions (reference
            # modeling_pmgt.py:460-461, 516-517)
            hm = head_mask.view(1, -1, 1, 1)
            p1 = p1 * hm
            p2 = p2 * hm
        probs = self.beta * p1 + (1 - self.beta) * p2
        out = probs @ v
        b = x.size(0)
        out = out.permute(0, 2, 1, 3).reshape(b, s, -1)
        return (out, probs) if output_attentions else out


class TorchPMGTLayer(nn.Module):
    def __init__(self, hidden, inter, heads, beta, dropout):
        super().__init__()
        self.attn = TorchDualAttention(hidden, heads, beta, dropout)
        self.attn_out = nn.Linear(hidden, hidden)
        self.ln1 = nn.LayerNorm(hidden, eps=1e-12)
        self.ff1 = nn.Linear(hidden, inter)
        self.ff2 = nn.Linear(inter, hidden)
        self.ln2 = nn.LayerNorm(hidden, eps=1e-12)
        self.drop = nn.Dropout(dropout)

    def forward(self, x, add_mask, head_mask=None, output_attentions=False):
        a = self.attn(x, add_mask, head_mask, output_attentions)
        probs = None
        if output_attentions:
            a, probs = a
        a = self.drop(self.attn_out(a))
        x = self.ln1(a + x)
        f = self.drop(self.ff2(F.gelu(self.ff1(x))))
        out = self.ln2(f + x)
        return (out, probs) if output_attentions else out


class TorchPMGT(nn.Module):
    def __init__(self, node_size, feat_dims, hidden=128, inter=128, layers=5,
                 heads=1, beta=0.5, dropout=0.1, max_pos=100):
        super().__init__()
        self.node_size = node_size
        self.tables = nn.ModuleList(
            nn.Embedding(node_size + 2, f, padding_idx=0) for f in feat_dims
        )
        for t in self.tables:
            t.requires_grad_(False)
        self.proj = nn.ModuleList(nn.Linear(f, hidden) for f in feat_dims)
        self.mod_attn = nn.Linear(len(feat_dims) * hidden, len(feat_dims))
        self.pos = nn.Embedding(max_pos, hidden)
        self.role = nn.Embedding(2, hidden)
        self.ln = nn.LayerNorm(hidden, eps=1e-12)
        self.drop = nn.Dropout(dropout)
        self.layers = nn.ModuleList(
            TorchPMGTLayer(hidden, inter, heads, beta, dropout) for _ in range(layers)
        )
        self.nfr_proj = nn.ModuleList(nn.Linear(hidden, f) for f in feat_dims)

    def encode(self, ids, mask, head_mask=None, output_hidden_states=False,
               output_attentions=False):
        feats = [t(ids) for t in self.tables]
        proj = [p(f) for p, f in zip(self.proj, feats)]
        attn = torch.softmax(self.mod_attn(torch.tanh(torch.cat(proj, -1))), -1)
        x = (attn.unsqueeze(-1) * torch.stack(proj, 2)).sum(2)
        s = ids.size(1)
        pos_ids = torch.arange(s).unsqueeze(0)
        role_ids = torch.cat([torch.zeros(1, 1, dtype=torch.long),
                              torch.ones(1, s - 1, dtype=torch.long)], dim=1)
        x = self.drop(self.ln(x + self.pos(pos_ids) + self.role(role_ids)))
        add_mask = (1.0 - mask).view(mask.size(0), 1, 1, -1) * torch.finfo(x.dtype).min
        all_hidden = [x] if output_hidden_states else None
        all_probs = [] if output_attentions else None
        for i, layer in enumerate(self.layers):
            lhm = None if head_mask is None else head_mask[i]
            x = layer(x, add_mask, lhm, output_attentions)
            if output_attentions:
                x, probs = x
                all_probs.append(probs)
            if output_hidden_states:
                all_hidden.append(x)
        if output_hidden_states or output_attentions:
            return x, all_hidden, all_probs
        return x


def run_reference_baseline(
    graph_arrays, feat_tables, hops=(16, 8, 4), max_ctx=5, batch_size=32,
    num_batches=5, seed=0,
) -> float:
    """Measure reference-equivalent pretraining throughput. Returns
    nodes/sec (targets processed per second, sampling + fwd + bwd)."""
    torch.manual_seed(seed)
    np.random.seed(seed)
    graph = HostGraph(*[np.asarray(a) for a in graph_arrays])
    feat_dims = [t.shape[1] for t in feat_tables]
    model = TorchPMGT(graph.num_nodes, feat_dims)
    for table, w in zip(model.tables, feat_tables):
        with torch.no_grad():
            table.weight.copy_(torch.from_numpy(np.asarray(w)))
    opt = torch.optim.AdamW(
        [p for p in model.parameters() if p.requires_grad], lr=1e-4
    )
    bce = nn.BCEWithLogitsLoss()
    mse = nn.MSELoss()

    node_ids = np.arange(2, graph.num_nodes + 2)

    def one_batch():
        targets = np.random.choice(node_ids, size=batch_size, replace=False)
        t_ids, t_masks = [], []
        pair_ids, pair_masks, pair_counts, labels = [], [], [], []
        for t in targets:
            seq, nc = sample_context_host(graph, int(t), list(hops), max_ctx)
            t_ids.append(seq)
            t_masks.append([1.0] * (nc + 1) + [0.0] * (max_ctx - nc))
            nbrs, _ = graph.adj[int(t)]
            n_pos = min(5, len(nbrs))
            pos = np.random.choice(nbrs, n_pos, replace=False) if n_pos else []
            n_neg = max(5, 10 - n_pos)
            negs = []
            nbr_set = set(nbrs.tolist())
            while len(negs) < n_neg:
                cand = np.random.randint(graph.num_nodes) + 2
                if cand not in nbr_set:
                    negs.append(cand)
            group_ids, group_masks = [], []
            for p in list(pos) + negs:
                seq_p, nc_p = sample_context_host(graph, int(p), list(hops), max_ctx)
                group_ids.append(seq_p)
                group_masks.append([1.0] * (nc_p + 1) + [0.0] * (max_ctx - nc_p))
            pair_ids.append(group_ids)
            pair_masks.append(group_masks)
            pair_counts.append(n_pos + len(negs))
            labels.append([1.0] * n_pos + [0.0] * len(negs))
        return (
            torch.tensor(t_ids), torch.tensor(t_masks),
            [torch.tensor(p) for p in pair_ids],
            [torch.tensor(m) for m in pair_masks],
            [torch.tensor(l) for l in labels],
        )

    def step(batch):
        t_ids, t_mask, pair_ids, pair_masks, labels = batch
        opt.zero_grad()
        target_out = model.encode(t_ids, t_mask)
        # per-sample GSR loop (reference models.py:104-127 shape)
        gsr_losses = []
        for i in range(len(pair_ids)):
            pout = model.encode(pair_ids[i], pair_masks[i])[:, 0]
            tcls = F.normalize(target_out[i, 0], dim=-1)
            pcls = F.normalize(pout, dim=-1)
            gsr_losses.append(bce(pcls @ tcls, labels[i]))
        gsr = torch.stack(gsr_losses).mean()
        # NFR masked pass
        masked = t_ids.clone()
        rand = torch.rand(masked[:, 1:].shape)
        m = (rand < 0.16) & (masked[:, 1:] != 0)
        tgt_idx = masked[:, 1:][m]
        masked[:, 1:][m] = 1
        mh = model.encode(masked, t_mask)[:, 1:][m]
        if tgt_idx.numel():
            nfr = torch.stack([
                mse(proj(mh), table(tgt_idx))
                for proj, table in zip(model.nfr_proj, model.tables)
            ]).mean()
        else:
            nfr = torch.zeros(())
        (gsr + nfr).backward()
        opt.step()

    # warmup
    step(one_batch())
    start = time.time()
    for _ in range(num_batches):
        step(one_batch())
    elapsed = time.time() - start
    return batch_size * num_batches / elapsed
