"""Sampling APIs (reference ``python/dgl/sampling/``)."""
from .neighbor import sample_neighbors, sample_neighbors_biased, select_topk
from .randomwalks import random_walk, node2vec_random_walk, pack_traces
from .negative import global_uniform_negative_sampling
from .pinsage import PinSAGESampler, RandomWalkNeighborSampler
from .labor import sample_labors
