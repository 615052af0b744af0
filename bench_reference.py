"""Measure the PyTorch reference's performance on the BASELINE.json configs.

The reference repo requires torch_geometric (not installed here), so this is
a faithful pure-torch reimplementation of its hot path for timing purposes:
DenseGCM per-step algorithm (reference src/gcm/gcm.py:213-321) with 2-layer
DenseGraphConv semantics (out = lin_rel(adj @ x) + lin_root(x)) and
TemporalBackedge([1]) (edge_selectors/temporal.py:72-88), stepped T times in a
Python loop exactly like the reference RL adapter (ray_gcm.py:200-202).

Run: python bench_reference.py  → prints JSON with timesteps/s on CPU.
"""

import json
import time

import torch


class DenseGraphConv(torch.nn.Module):
    def __init__(self, f_in, f_out):
        super().__init__()
        self.lin_rel = torch.nn.Linear(f_in, f_out)
        self.lin_root = torch.nn.Linear(f_in, f_out, bias=False)

    def forward(self, x, adj):
        return self.lin_rel(torch.matmul(adj, x)) + self.lin_root(x)


def sparsemax_1d(z):
    """Sparsemax over the last dim (Martins & Astudillo 2016) — the pip
    `sparsemax` dependency the reference's Spardmax wraps (util.py:29-42)."""
    zs, _ = torch.sort(z, dim=-1, descending=True)
    rng = torch.arange(1, z.shape[-1] + 1, dtype=z.dtype)
    csum = zs.cumsum(-1)
    support = 1 + rng * zs > csum
    k = support.to(z.dtype).cumsum(-1).gather(
        -1, (support.sum(-1, keepdim=True) - 1).clamp(min=0))
    tau = (csum.gather(-1, (support.sum(-1, keepdim=True) - 1).clamp(min=0))
           - 1) / k.clamp(min=1)
    return torch.clamp(z - tau, min=0)


class EdgeMLP(torch.nn.Module):
    """The reference LearnedEdge scorer (edge_selectors/learned.py:38-51)."""

    def __init__(self, hidden):
        super().__init__()
        self.net = torch.nn.Sequential(
            torch.nn.Linear(2 * hidden, hidden), torch.nn.ReLU(),
            torch.nn.LayerNorm(hidden),
            torch.nn.Linear(hidden, hidden), torch.nn.ReLU(),
            torch.nn.LayerNorm(hidden),
            torch.nn.Linear(hidden, 1))

    def forward(self, pairs):
        return self.net(pairs)


class RefDenseGCM(torch.nn.Module):
    """Reference DenseGCM per-step semantics (gcm.py:213-321); edge selector
    is temporal backedge hop 1, dense-past (edge_selectors/dense.py), a
    distance-threshold selector (edge_selectors/distance.py:42-81), or the
    learned pair-MLP selector (edge_selectors/learned.py:7-125)."""

    def __init__(self, obs, hidden, graph_size, selector="temporal"):
        self.selector = selector
        super().__init__()
        self.pre = torch.nn.Linear(obs, hidden)  # noqa: E501
        self.conv1 = DenseGraphConv(hidden, hidden)
        self.conv2 = DenseGraphConv(hidden, hidden)
        if selector == "learned":
            self.edge_mlp = EdgeMLP(obs)
        self.N = graph_size

    def _distance_mask(self, nodes, num_nodes, B, N):
        """Score current node vs memory, threshold (distance.py:18-39)."""
        B_idx = torch.arange(B)
        curr = nodes[B_idx, num_nodes]  # [B, F]
        if self.selector == "euclidean":
            # reference broadcast: cdist([B,F],[B,N,F]) -> [B,B,N], mean dim 1
            d = torch.cdist(curr, nodes).mean(dim=1)
            thr = 1.0
        elif self.selector == "cosine":
            d = torch.nn.CosineSimilarity(dim=2)(
                curr.unsqueeze(1).expand(-1, N, -1), nodes)
            thr = 0.5
        else:  # spatial: pose slice dims 0:2 (distance.py:64-81)
            d = torch.cdist(curr[:, None, 0:2], nodes[:, :, 0:2])[:, 0]
            thr = 0.25
        idx = torch.arange(N)[None, :]
        return (d < thr) & (idx < num_nodes[:, None])

    def forward(self, x, hidden):
        nodes, adj, num_nodes = hidden
        B = x.shape[0]
        B_idx = torch.arange(B)
        N = self.N
        if torch.any(num_nodes + 1 > N):
            over = (num_nodes + 1 > N).nonzero().squeeze(-1)
            nodes = nodes.clone()
            adj = adj.clone()
            nodes[over, 0] = 0
            adj[over, 0, :] = 0
            adj[over, :, 0] = 0
            nodes[over] = torch.roll(nodes[over], -1, -2)
            adj[over] = torch.roll(adj[over], (-1, -1), (-1, -2))
            num_nodes = num_nodes.clone()
            num_nodes[over] -= 1
        nodes = nodes.clone()
        nodes[B_idx, num_nodes] = x
        adj = adj.clone()
        if self.selector == "temporal":
            valid = (num_nodes >= 1).nonzero().squeeze(-1)
            adj[valid, num_nodes[valid], num_nodes[valid] - 1] = 1
        elif self.selector == "dense":  # dense-past (edge_selectors/dense.py:16-21)
            for b in range(x.shape[0]):
                i = int(num_nodes[b])
                adj[b, i, : i + 1] = 1
                adj[b, :i, i] = 1
        elif self.selector == "learned":
            # pair-MLP over (current || past) + Spardmax merge
            # (learned.py:53-113); pairs built per batch like
            # idxs_up_to_num_nodes (util.py:501-522)
            curr = nodes[B_idx, num_nodes]
            pairs = torch.cat(
                [curr[:, None, :].expand(-1, N, -1), nodes], dim=-1)
            logits = self.edge_mlp(pairs)[..., 0]  # [B, N]
            idx = torch.arange(N)[None, :]
            logits = torch.where(idx < num_nodes[:, None], logits,
                                 torch.full_like(logits, -1e10))
            soft = sparsemax_1d(logits)
            hard = (soft > 0).float()
            e = hard + soft - soft.detach()  # STE (util.py:9-26)
            adj = adj.clone()
            adj[B_idx, num_nodes] = adj[B_idx, num_nodes] + e
        else:
            mask = self._distance_mask(nodes, num_nodes, B, N)
            adj[B_idx, num_nodes] = torch.where(
                mask, torch.ones_like(adj[B_idx, num_nodes]),
                adj[B_idx, num_nodes])
        h = self.pre(nodes)
        h = torch.tanh(self.conv1(h, adj))
        h = torch.tanh(self.conv2(h, adj))
        mx = h[B_idx, num_nodes]
        return mx, (nodes, adj, num_nodes + 1)


def run_lstm(B=32, obs=8, hidden=32, T=128, backward=False, repeats=3):
    """LSTM comparator (reference tests/test_speed.py:22-40)."""
    torch.manual_seed(0)
    pre = torch.nn.Linear(obs, hidden)
    lstm = torch.nn.LSTM(hidden, hidden, batch_first=True)
    xs = torch.randn(B, T, obs)

    def rollout():
        out, _ = lstm(pre(xs))
        return out

    rollout()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = rollout()
        if backward:
            out.pow(2).mean().backward()
        best = min(best, time.perf_counter() - t0)
    return B * T / best


def run(B=32, obs=8, hidden=32, N=128, T=128, backward=False, repeats=3,
        selector="temporal"):
    torch.manual_seed(0)
    model = RefDenseGCM(obs, hidden, N, selector=selector)
    xs = torch.randn(T, B, obs)

    def rollout():
        hidden_state = (
            torch.zeros(B, N, obs),
            torch.zeros(B, N, N),
            torch.zeros(B, dtype=torch.long),
        )
        outs = []
        for t in range(T):
            out, hidden_state = model(xs[t], hidden_state)
            outs.append(out)
        return torch.stack(outs)

    # warmup
    rollout()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = rollout()
        if backward:
            outs.pow(2).mean().backward()
        best = min(best, time.perf_counter() - t0)
    return B * T / best


def run_nav(B=8, F=16, V=128, tau=8, n_win=4, r=2.0, repeats=2):
    """Reference NavGCM rollout counterpart (nav_gcm.py:237-263): radius
    edges from geometry each call (cdist threshold — the pure-torch stand-in
    for torch_geometric.nn.radius_graph), causal filter, 2-layer GraphConv
    over the flat edge list via scatter_add."""
    torch.manual_seed(0)
    pose = 3
    lin1_rel = torch.nn.Linear(F + pose, F)
    lin1_root = torch.nn.Linear(F + pose, F, bias=False)
    lin2_rel = torch.nn.Linear(F, F)
    lin2_root = torch.nn.Linear(F, F, bias=False)

    def conv(x, src, snk, lin_rel, lin_root):
        agg = torch.zeros(x.shape[0], lin_rel.in_features)
        agg.index_add_(0, snk, x[src])
        return lin_rel(agg) + lin_root(x)

    def window(state_x, state_pos, state_rot, t, xs, poss, rots):
        state_x = torch.cat([state_x, xs], dim=1)
        state_pos = torch.cat([state_pos, poss], dim=1)
        state_rot = torch.cat([state_rot, rots], dim=1)
        outs = []
        for b in range(B):
            feats = torch.cat([state_x[b], state_pos[b], state_rot[b]], -1)
            d = torch.cdist(state_pos[b], state_pos[b])
            ii, jj = (d <= r).nonzero(as_tuple=True)
            keep = jj < ii  # causal: source strictly before sink
            snk, src = ii[keep], jj[keep]
            h = torch.tanh(conv(feats, src, snk, lin1_rel, lin1_root))
            h = torch.tanh(conv(h, src, snk, lin2_rel, lin2_root))
            outs.append(h[-tau:])
        return state_x, state_pos, state_rot, t + tau, torch.stack(outs)

    def rollout():
        sx = torch.zeros(B, 0, F)
        sp = torch.zeros(B, 0, 2)
        sr = torch.zeros(B, 0, 1)
        t = 0
        for _ in range(n_win):
            xs = torch.randn(B, tau, F)
            poss = torch.randn(B, tau, 2)
            rots = torch.randn(B, tau, 1)
            sx, sp, sr, t, out = window(sx, sp, sr, t, xs, poss, rots)
        return out

    rollout()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        rollout()
        best = min(best, time.perf_counter() - t0)
    return B * tau * n_win / best


if __name__ == "__main__":
    fwd = run(backward=False)
    fwd_bwd = run(backward=True)
    dense_edge = run(backward=True, selector="dense", repeats=2)
    dense_edge_512 = run(backward=False, N=512, T=64, selector="dense",
                         repeats=2)
    euclid = run(backward=False, selector="euclidean", repeats=2)
    cosine = run(backward=False, selector="cosine", repeats=2)
    spatial = run(backward=False, selector="spatial", repeats=2)
    learned = run(backward=False, selector="learned", repeats=2)
    nav = run_nav()
    lstm = run_lstm(backward=True)
    print(json.dumps({
        "reference_dense_gcm_fwd_timesteps_per_s": round(fwd),
        "reference_dense_gcm_fwd_bwd_timesteps_per_s": round(fwd_bwd),
        "reference_dense_gcm_denseedge_fwd_bwd_timesteps_per_s": round(
            dense_edge),
        "reference_denseedge_n512_fwd_timesteps_per_s": round(dense_edge_512),
        "reference_euclidean_fwd_timesteps_per_s": round(euclid),
        "reference_cosine_fwd_timesteps_per_s": round(cosine),
        "reference_spatial_fwd_timesteps_per_s": round(spatial),
        "reference_learned_edge_fwd_timesteps_per_s": round(learned),
        "reference_nav_gcm_fwd_timesteps_per_s": round(nav),
        "reference_lstm_fwd_bwd_timesteps_per_s": round(lstm),
        "config": "B=32 obs=8 hidden=32 graph=128 T=128",
        "hardware": "CPU (torch, reference-equivalent reimplementation)",
    }))
