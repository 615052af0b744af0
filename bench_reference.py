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


class RefDenseGCM(torch.nn.Module):
    """Reference DenseGCM per-step semantics (gcm.py:213-321); edge selector
    is temporal backedge hop 1 or dense-past (edge_selectors/dense.py)."""

    def __init__(self, obs, hidden, graph_size, selector="temporal"):
        self.selector = selector
        super().__init__()
        self.pre = torch.nn.Linear(obs, hidden)  # noqa: E501
        self.conv1 = DenseGraphConv(hidden, hidden)
        self.conv2 = DenseGraphConv(hidden, hidden)
        self.N = graph_size

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
        else:  # dense-past (edge_selectors/dense.py:16-21)
            for b in range(x.shape[0]):
                i = int(num_nodes[b])
                adj[b, i, : i + 1] = 1
                adj[b, :i, i] = 1
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


if __name__ == "__main__":
    fwd = run(backward=False)
    fwd_bwd = run(backward=True)
    dense_edge = run(backward=True, selector="dense", repeats=2)
    lstm = run_lstm(backward=True)
    print(json.dumps({
        "reference_dense_gcm_fwd_timesteps_per_s": round(fwd),
        "reference_dense_gcm_fwd_bwd_timesteps_per_s": round(fwd_bwd),
        "reference_dense_gcm_denseedge_fwd_bwd_timesteps_per_s": round(
            dense_edge),
        "reference_lstm_fwd_bwd_timesteps_per_s": round(lstm),
        "config": "B=32 obs=8 hidden=32 graph=128 T=128",
        "hardware": "CPU (torch, reference-equivalent reimplementation)",
    }))
