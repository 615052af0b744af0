"""ctypes bindings for the native host trajectory store (native/host_buffer.cpp).

Auto-builds libgcm_host.so with the repo Makefile on first use (g++ is part
of the toolchain; pybind11 is not in the image, hence ctypes)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgcm_host.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "host_buffer.cpp")
    stale = (not os.path.exists(_LIB_PATH)
             or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src))
    if stale:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rb_create.restype = ctypes.c_void_p
    lib.rb_create.argtypes = [ctypes.c_size_t, ctypes.c_int]
    lib.rb_destroy.argtypes = [ctypes.c_void_p]
    lib.rb_append_episode.restype = ctypes.c_int64
    lib.rb_append_episode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
    ]
    lib.rb_num_episodes.restype = ctypes.c_int32
    lib.rb_num_episodes.argtypes = [ctypes.c_void_p]
    lib.rb_total_steps.restype = ctypes.c_int64
    lib.rb_total_steps.argtypes = [ctypes.c_void_p]
    lib.rb_sample_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.ep_create.restype = ctypes.c_void_p
    lib.ep_create.argtypes = [ctypes.c_int32, ctypes.c_int32,
                              ctypes.c_int32, ctypes.c_float,
                              ctypes.c_uint64]
    lib.ep_destroy.argtypes = [ctypes.c_void_p]
    lib.ep_obs_dim.restype = ctypes.c_int32
    lib.ep_obs_dim.argtypes = [ctypes.c_void_p]
    lib.ep_reset.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_float)]
    lib.ep_set_state.argtypes = [ctypes.c_void_p] + \
        [ctypes.POINTER(ctypes.c_float)] * 4
    lib.ep_step.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.pack_edges.restype = ctypes.c_int32
    lib.pack_edges.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class HostReplayBuffer:
    """Episode ring buffer with zero-padded fixed-shape batch sampling — the
    host data path feeding SparseGCM's time-batched training
    ([B, T_max, F] + taus, reference sparse_gcm.py:73-99 input layout)."""

    def __init__(self, capacity_steps: int, obs_dim: int):
        self._lib = _load()
        self.obs_dim = obs_dim
        self._h = ctypes.c_void_p(
            self._lib.rb_create(capacity_steps, obs_dim))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.rb_destroy(self._h)
            self._h = None

    def append(self, obs: np.ndarray, actions: np.ndarray,
               rewards: np.ndarray) -> int:
        obs = np.ascontiguousarray(obs, np.float32)
        actions = np.ascontiguousarray(actions, np.int32)
        rewards = np.ascontiguousarray(rewards, np.float32)
        T = obs.shape[0]
        assert obs.shape == (T, self.obs_dim)
        assert actions.shape == (T,) and rewards.shape == (T,)
        return self._lib.rb_append_episode(
            self._h, _fptr(obs), _i32ptr(actions), _fptr(rewards), T)

    @property
    def num_episodes(self) -> int:
        return self._lib.rb_num_episodes(self._h)

    @property
    def total_steps(self) -> int:
        return self._lib.rb_total_steps(self._h)

    def sample(self, B: int, T_max: int, seed: int = 0):
        obs = np.empty((B, T_max, self.obs_dim), np.float32)
        acts = np.empty((B, T_max), np.int32)
        rews = np.empty((B, T_max), np.float32)
        taus = np.empty((B,), np.int32)
        self._lib.rb_sample_batch(self._h, B, T_max, seed, _fptr(obs),
                                  _i32ptr(acts), _fptr(rews), _i32ptr(taus))
        return obs, acts, rews, taus


def pack_edges_host(sinks, sources, lengths, max_edges: int,
                    edge_fill: int = -1):
    """Native ragged→fixed edge-list packing (util.pack_hidden's loop,
    util.py:343-351, in C++). sinks/sources: concatenated int64 arrays;
    lengths: per-batch edge counts. Returns ([B, 2, max_edges] int64,
    n_overflowed)."""
    lib = _load()
    sinks = np.ascontiguousarray(sinks, np.int64)
    sources = np.ascontiguousarray(sources, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    B = lengths.shape[0]
    out = np.empty((B, 2, max_edges), np.int64)
    overflowed = lib.pack_edges(_i64ptr(sinks), _i64ptr(sources),
                                _i64ptr(lengths), B, max_edges, edge_fill,
                                _i64ptr(out))
    return out, int(overflowed)
