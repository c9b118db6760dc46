from impx.ops.mlp import mlp_apply, mlp_init
from impx.ops.attention import multi_head_attention, attention_from_prob
from impx.ops.sinkhorn import sink_algorithm, dual_softmax, log_optimal_transport
from impx.ops.matching import compute_matches
