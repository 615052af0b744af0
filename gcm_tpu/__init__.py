"""gcm_tpu — a TPU-native graph-memory framework for reinforcement learning.

Built from scratch in JAX/XLA/Pallas, providing the capabilities of Graph
Convolutional Memory (arXiv 2106.14117; reference implementation
proroklab/graph-conv-memory) as pure functions over fixed-shape pytrees.
"""

from gcm_tpu.core.graph_state import (
    DenseGraphState,
    SparseGraphState,
    dense_initial_state,
    sparse_initial_state,
)
from gcm_tpu.edges.chain import EdgeChain
from gcm_tpu.edges.dense import DenseEdge
from gcm_tpu.edges.distance import CosineEdge, EuclideanEdge, SpatialEdge
from gcm_tpu.edges.learned import LearnedEdge
from gcm_tpu.edges.temporal import TemporalBackedge
from gcm_tpu.edges.sparse_learned import LearnedEdge as SparseLearnedEdge
from gcm_tpu.edges.sparse_spatial import (
    SparseEdgeChain,
    SpatialKNNEdge,
    SpatialRadiusEdge,
)
from gcm_tpu.edges.sparse_temporal import TemporalEdge
from gcm_tpu.models.banded_gcm import (BandedRingGCM,
                                       BandedScoredGCM,
                                       BandedScoredState,
                                       BandedState)
from gcm_tpu.models.clique_gcm import CliqueGCM
from gcm_tpu.models.converters import dense_to_sparse, sparse_to_dense
from gcm_tpu.models.dense_gcm import DenseGCM
from gcm_tpu.models.nav_gcm import (NavDenseGNN, NavGCM,
                                    NavGCMIncremental, NavState, nav_core)
from gcm_tpu.models.ring_gcm import RingDenseGCM, RingGraphState
from gcm_tpu.models.sparse_gcm import SparseGCM
from gcm_tpu.parallel.sharded_sparse import (ShardedSparseGCM,
                                             ShardedSparseState)
from gcm_tpu.utils.packing import pack_hidden, unpack_hidden
from gcm_tpu.models.positional import PositionalEncoding, RelativePositionalEncoding
from gcm_tpu.nn.dense_conv import DenseGCNConv, DenseGNN, DenseGraphConv
from gcm_tpu.nn.module import MLP, LayerNorm, Linear
from gcm_tpu.nn.nav_conv import NavPoseGNN, NavRelPosConv
from gcm_tpu.rl.a2c import A2C
from gcm_tpu.rl.distributions import Categorical, DiagGaussian
from gcm_tpu.rl.env import (CartPoleEnv, ContinuousRecallEnv, RecallEnv,
                            TMazeEnv)
from gcm_tpu.rl.ppo import PPO
from gcm_tpu.rl.wrappers import GCMActorCritic, SparseGCMActorCritic
from gcm_tpu.nn.sparse_conv import GCNConv, GraphConv, SparseGNN

__version__ = "0.1.0"

__all__ = [
    "BandedRingGCM",
    "ShardedSparseGCM",
    "ShardedSparseState",
    "BandedScoredGCM",
    "BandedScoredState",
    "BandedState",
    "CliqueGCM",
    "RingDenseGCM",
    "RingGraphState",
    "NavGCM",
    "NavGCMIncremental",
    "NavDenseGNN",
    "NavState",
    "dense_to_sparse",
    "sparse_to_dense",
    "SparseGCM",
    "SparseLearnedEdge",
    "SparseEdgeChain",
    "SpatialKNNEdge",
    "SpatialRadiusEdge",
    "TemporalEdge",
    "pack_hidden",
    "unpack_hidden",
    "DenseGraphState",
    "SparseGraphState",
    "dense_initial_state",
    "sparse_initial_state",
    "EdgeChain",
    "DenseEdge",
    "CosineEdge",
    "EuclideanEdge",
    "SpatialEdge",
    "LearnedEdge",
    "TemporalBackedge",
    "DenseGCM",
    "PositionalEncoding",
    "RelativePositionalEncoding",
    "DenseGCNConv",
    "DenseGNN",
    "DenseGraphConv",
    "MLP",
    "LayerNorm",
    "Linear",
    "GCNConv",
    "GraphConv",
    "SparseGNN",
    "NavPoseGNN",
    "NavRelPosConv",
    "A2C",
    "PPO",
    "Categorical",
    "DiagGaussian",
    "ContinuousRecallEnv",
    "CartPoleEnv",
    "RecallEnv",
    "TMazeEnv",
    "GCMActorCritic",
    "SparseGCMActorCritic",
]
