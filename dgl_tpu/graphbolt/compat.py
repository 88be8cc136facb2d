"""GraphBolt reference-surface completion (reference
``python/dgl/graphbolt/``: ``base.py``, ``internal/utils.py``,
``sampled_subgraph.py``, ``impl/*``): canonical-etype string helpers,
CSCFormatBase, compaction utilities, on-disk helpers, and the datapipe
stage names layered over the pipeline in ``pipeline.py``."""
from __future__ import annotations

import dataclasses
import hashlib
import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .pipeline import _Pipe, Transform, NeighborSampler, UniformNegativeSampler
from .sampling_graph import CSCSamplingGraph, unique_and_compact
from .itemset import ItemSet, ItemSetDict
from .feature_store import BasicFeatureStore, ArrayFeature, DiskBasedFeature

CANONICAL_ETYPE_DELIMITER = ":"
ORIGINAL_EDGE_ID = "_ORIGINAL_EDGE_ID"


# ---------------------------------------------------------------------------
# string/type helpers (reference graphbolt/base.py)
# ---------------------------------------------------------------------------

def etype_tuple_to_str(c_etype) -> str:
    """('u', 'r', 'v') -> 'u:r:v' (reference ``etype_tuple_to_str``)."""
    assert len(c_etype) == 3
    return CANONICAL_ETYPE_DELIMITER.join(c_etype)


def etype_str_to_tuple(c_etype: str):
    """'u:r:v' -> ('u', 'r', 'v')."""
    out = tuple(c_etype.split(CANONICAL_ETYPE_DELIMITER))
    assert len(out) == 3, f"bad canonical etype string {c_etype!r}"
    return out


def seed_type_str_to_ntypes(seed_type: str, seed_size: int):
    """Seed-type string -> node types of the seed columns (reference
    ``seed_type_str_to_ntypes``): a node type for node seeds, or
    'u:r:v' -> [u, v] for edge seeds."""
    if CANONICAL_ETYPE_DELIMITER in seed_type:
        u, _, v = etype_str_to_tuple(seed_type)
        return [u, v][:seed_size]
    return [seed_type] * seed_size


def is_scalar(x) -> bool:
    return np.isscalar(x) or (hasattr(x, "ndim") and x.ndim == 0)


def isin(elements, test_elements):
    """Membership mask like torch.isin (reference ``isin``; sorted
    searchsorted under jit)."""
    elements = jnp.asarray(elements)
    test = jnp.sort(jnp.asarray(test_elements).reshape(-1))
    idx = jnp.searchsorted(test, elements)
    idx = jnp.clip(idx, 0, test.shape[0] - 1)
    return jnp.take(test, idx) == elements


def index_select(tensor, index):
    """Row gather (reference graphbolt ``index_select``)."""
    return jnp.take(jnp.asarray(tensor), jnp.asarray(index), axis=0)


def expand_indptr(indptr, dtype=None, node_ids=None, output_size=None):
    """CSC indptr -> per-edge node ids (reference ``expand_indptr``)."""
    indptr = np.asarray(indptr)
    counts = np.diff(indptr)
    ids = (np.arange(len(counts)) if node_ids is None
           else np.asarray(node_ids))
    out = np.repeat(ids, counts)
    if output_size is not None:
        out = out[:output_size]
    return jnp.asarray(out if dtype is None else out.astype(dtype))


def seed(val: int) -> None:
    """Seed graphbolt sampling RNG (reference ``gb.seed``)."""
    from ..utils import set_seed
    set_seed(int(val))


def apply_to(x, device):
    """Recursively device_put a minibatch/pytree (reference
    ``apply_to``)."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, device)
        if hasattr(a, "shape") else a, x)


# ---------------------------------------------------------------------------
# CSCFormatBase + compaction (reference sampled_subgraph.py / internal)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class CSCFormatBase:
    """A CSC pair (indptr, indices) — the per-layer sampled structure
    record (reference ``base.py CSCFormatBase``)."""
    indptr: object
    indices: object

    def __repr__(self):
        return (f"CSCFormatBase(indptr={np.asarray(self.indptr).shape}, "
                f"indices={np.asarray(self.indices).shape})")


def compact_csc_format(csc_formats, dst_nodes):
    """Compact global indices to local ids with dst nodes leading
    (reference ``compact_csc_format``): returns (original_row_node_ids,
    compacted csc_formats)."""
    single = isinstance(csc_formats, CSCFormatBase)
    fmts = [csc_formats] if single else list(csc_formats)
    dst = np.asarray(dst_nodes).ravel()
    cat = (np.concatenate([dst] + [np.asarray(f.indices).ravel()
                                   for f in fmts])
           if fmts else dst)
    # to_block ordering: dst seeds first, then remaining ids by first
    # occurrence
    _, first = np.unique(cat, return_index=True)
    order = cat[np.sort(first)]
    in_dst = np.isin(order, dst)
    ordered = np.concatenate([dst, order[~in_dst]])
    remap = {int(v): i for i, v in enumerate(ordered)}
    out = [CSCFormatBase(
        f.indptr,
        jnp.asarray(np.asarray(
            [remap[int(x)] for x in np.asarray(f.indices).ravel()],
            np.int32).reshape(np.asarray(f.indices).shape)))
        for f in fmts]
    return jnp.asarray(ordered), (out[0] if single else out)


def unique_and_compact_csc_formats(csc_formats, unique_dst_nodes):
    """Reference ``unique_and_compact_csc_formats``: like
    :func:`compact_csc_format` (dst ids prefixed in the unique list)."""
    return compact_csc_format(csc_formats, unique_dst_nodes)


def compact_temporal_nodes(nodes, timestamps):
    """Compact (node, timestamp) pairs, keeping one id per distinct
    timestamped copy (reference temporal compaction).  Returns
    (unique nodes in first-occurrence order, per-input compact ids)."""
    nodes = np.asarray(nodes)
    ts = np.asarray(timestamps)
    key = nodes.astype(np.int64) * (int(ts.max()) + 1 if len(ts)
                                    else 1) + ts
    _, first, inv = np.unique(key, return_index=True,
                              return_inverse=True)
    # remap sorted-unique ids to first-occurrence order
    order = np.argsort(first)
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    return (jnp.asarray(nodes[first[order]]),
            jnp.asarray(rank[inv].astype(np.int32)))


# ---------------------------------------------------------------------------
# datapipe stage names (reference dataloader.py / impl/neighbor_sampler.py)
# ---------------------------------------------------------------------------

class _Stage(_Pipe):
    """Shared base for the compat datapipe stages: stores the upstream
    pipe and applies ``_process`` per item (identity by default)."""

    def __init__(self, datapipe=None, *args, **kwargs):
        self.source = datapipe

    def _process(self, item):
        return item

    def __iter__(self):
        for item in self.source:
            yield self._process(item)


class MiniBatchTransformer(Transform):
    """Reference ``MiniBatchTransformer`` — user fn over minibatches."""


class SubgraphSampler(_Stage):
    """Base class of sampling stages (reference ``subgraph_sampler.py``):
    subclasses implement ``sample_subgraphs(seeds)``."""

    def _process(self, item):
        return self.sample_subgraphs(item)

    def sample_subgraphs(self, seeds):
        raise NotImplementedError


class NegativeSampler(_Stage):
    """Base of negative-sampling stages (reference
    ``negative_sampler.py``)."""


class Bufferer(_Stage):
    """Prefetch buffer stage (reference ``Bufferer``): materializes up
    to ``buffer_size`` items ahead."""

    def __init__(self, datapipe, buffer_size: int = 1):
        super().__init__(datapipe)
        self.buffer_size = int(buffer_size)

    def __iter__(self):
        from collections import deque
        buf = deque()
        it = iter(self.source)
        done = False
        while True:
            while not done and len(buf) <= self.buffer_size:
                try:
                    buf.append(next(it))
                except StopIteration:
                    done = True
            if not buf:
                return
            yield buf.popleft()


class EndMarker(_Stage):
    """Identity end-of-pipe marker (reference ``EndMarker``)."""


class Waiter(_Stage):
    """Synchronization stage (reference ``Waiter``): blocks until the
    item's futures are ready — XLA arrays resolve via
    block_until_ready."""

    def _process(self, item):
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready()
            if hasattr(a, "block_until_ready") else a, item)
        return item


FutureWaiter = Waiter


class MultiprocessingWrapper(_Stage):
    """Reference ``MultiprocessingWrapper``: runs pre-sampler stages in
    workers.  The TPU pipeline samples in-process (host numpy is the
    worker); this stage is a pass-through carrying the num_workers
    contract."""

    def __init__(self, datapipe, num_workers: int = 0):
        super().__init__(datapipe)
        self.num_workers = num_workers


class FetcherAndSampler(_Stage):
    """Fused fetch+sample stage marker (reference ``FetcherAndSampler``,
    overlap rewrite); composition happens in ``DataLoader``."""


class FetchInsubgraphData(_Stage):
    """Side-stream subgraph prefetch stage (reference
    ``impl/neighbor_sampler.py FetchInsubgraphData``); pass-through on
    TPU (sampling is host-side)."""


class SamplePerLayer(_Stage):
    """Single-layer sampling stage (reference ``SamplePerLayer``)."""

    def __init__(self, datapipe, sampler, fanout, replace=False,
                 prob_name=None):
        super().__init__(datapipe)
        self.sampler = sampler
        self.fanout = fanout
        self.replace = replace
        self.prob_name = prob_name

    def _process(self, seeds):
        return self.sampler.sample_neighbors(
            np.asarray(seeds), [self.fanout], replace=self.replace,
            probs_name=self.prob_name)


SamplePerLayerFromFetchedSubgraph = SamplePerLayer
NeighborSamplerImpl = NeighborSampler


class CompactPerLayer(_Stage):
    """Per-layer compaction stage (reference ``CompactPerLayer``)."""


class InSubgraphSampler(_Stage):
    """1-hop full in-subgraph sampler stage (reference
    ``impl/in_subgraph_sampler.py``)."""

    def __init__(self, datapipe, graph):
        super().__init__(datapipe)
        self.graph = graph

    def _process(self, seeds):
        return self.graph.in_subgraph(np.asarray(seeds))


class TemporalNeighborSampler(_Stage):
    """Temporal sampling stage (reference
    ``impl/temporal_neighbor_sampler.py``): respects per-node seed
    timestamps via the graph's temporal sampler."""

    def __init__(self, datapipe, graph, fanouts, timestamp_attr="timestamp"):
        super().__init__(datapipe)
        self.graph = graph
        self.fanouts = fanouts
        self.timestamp_attr = timestamp_attr

    def _process(self, item):
        seeds, ts = item if isinstance(item, tuple) else (item, None)
        sub = self.graph.temporal_sample_neighbors(
            np.asarray(seeds), np.asarray(ts), self.fanouts)
        return sub


# ---------------------------------------------------------------------------
# class-name aliases (reference central names)
# ---------------------------------------------------------------------------

FusedCSCSamplingGraph = CSCSamplingGraph
SamplingGraph = CSCSamplingGraph
HeteroItemSet = ItemSetDict
FeatureStore = BasicFeatureStore


class SampledSubgraphImpl:
    """Typed sampled-subgraph record (reference
    ``impl/sampled_subgraph_impl.py``): per-etype CSC formats +
    original ids."""

    def __init__(self, sampled_csc=None, original_column_node_ids=None,
                 original_row_node_ids=None, original_edge_ids=None):
        self.sampled_csc = sampled_csc
        self.original_column_node_ids = original_column_node_ids
        self.original_row_node_ids = original_row_node_ids
        self.original_edge_ids = original_edge_ids


class Dataset:
    """Abstract dataset (reference ``dataset.py Dataset``): ``tasks``,
    ``graph``, ``feature``, ``dataset_name``."""

    @property
    def tasks(self):
        raise NotImplementedError

    @property
    def graph(self):
        raise NotImplementedError

    @property
    def feature(self):
        raise NotImplementedError

    @property
    def dataset_name(self):
        raise NotImplementedError


class Task:
    """Abstract task record (reference ``dataset.py Task``)."""

    def __init__(self, metadata=None, train_set=None, validation_set=None,
                 test_set=None):
        self.metadata = metadata or {}
        self.train_set = train_set
        self.validation_set = validation_set
        self.test_set = test_set


LegacyDataset = Dataset


class TorchBasedFeatureStore(BasicFeatureStore):
    """Build a feature store from OnDiskFeatureData specs (reference
    ``impl/torch_based_feature_store.py``)."""

    def __init__(self, feature_data=None):
        feats = {}
        for spec in (feature_data or []):
            domain = spec["domain"] if isinstance(spec, dict) else \
                spec.domain
            name = spec["name"] if isinstance(spec, dict) else spec.name
            typ = (spec.get("type") if isinstance(spec, dict)
                   else getattr(spec, "type", None))
            path = spec["path"] if isinstance(spec, dict) else spec.path
            in_mem = (spec.get("in_memory", True)
                      if isinstance(spec, dict)
                      else getattr(spec, "in_memory", True))
            arr = np.load(path, mmap_mode=None if in_mem else "r")
            feat = (ArrayFeature(arr) if in_mem
                    else DiskBasedFeature(path))
            feats[(domain, typ, name)] = feat
        super().__init__(feats)


class GPUCache:
    """Hot-row device cache (reference ``impl/gpu_cache.py`` backed by
    HugeCTR): HBM-resident LRU-ish key->row store."""

    def __init__(self, cache_shape, dtype=jnp.float32):
        n, d = cache_shape
        self.keys = np.full(n, -1, np.int64)
        self.values = jnp.zeros((n, d), dtype)
        self.n = n

    def query(self, keys):
        keys = np.asarray(keys)
        slots = keys % self.n
        hit = self.keys[slots] == keys
        values = jnp.take(self.values, jnp.asarray(slots), axis=0)
        missing_index = np.nonzero(~hit)[0]
        return values, jnp.asarray(hit), jnp.asarray(
            keys[missing_index])

    def replace(self, keys, values):
        keys = np.asarray(keys)
        slots = keys % self.n
        self.keys[slots] = keys
        self.values = self.values.at[jnp.asarray(slots)].set(
            jnp.asarray(values))


def num_cache_items(cache_capacity_in_bytes, single_item):
    """How many rows fit in a byte budget (reference
    ``num_cache_items``)."""
    row = np.asarray(single_item)
    return int(cache_capacity_in_bytes // max(row.nbytes, 1))


# ---------------------------------------------------------------------------
# on-disk helpers (reference internal/utils.py, ondisk_dataset.py)
# ---------------------------------------------------------------------------

def read_data(path, fmt="numpy", in_memory=True):
    """Load an array file (reference ``read_data``)."""
    if fmt in ("numpy", "npy"):
        return np.load(path, mmap_mode=None if in_memory else "r")
    if fmt == "csv":
        return np.loadtxt(path, delimiter=",")
    raise ValueError(fmt)


def save_data(data, path, fmt="numpy"):
    if fmt in ("numpy", "npy"):
        np.save(path, np.asarray(data))
        return
    raise ValueError(fmt)


def read_edges(dataset_dir, edge_fmt, edge_path):
    """Load an edge list as (src, dst) (reference ``read_edges``)."""
    full = os.path.join(dataset_dir, edge_path)
    if edge_fmt in ("numpy", "npy"):
        pairs = np.load(full)
    else:
        pairs = np.loadtxt(full, delimiter=",", dtype=np.int64)
    if pairs.ndim == 1:
        pairs = pairs.reshape(-1, 2)
    if pairs.shape[0] == 2 and pairs.shape[1] != 2:
        return pairs[0], pairs[1]
    return pairs[:, 0], pairs[:, 1]


def get_npy_dim(npy_path):
    """Rank of an .npy file without loading it (reference
    ``get_npy_dim``)."""
    return len(np.load(npy_path, mmap_mode="r").shape)


def calculate_file_hash(file_path, hash_algo="md5"):
    h = hashlib.new(hash_algo)
    with open(file_path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def calculate_dir_hash(dir_path, hash_algo="md5"):
    """{file: hash} over a directory tree (reference
    ``calculate_dir_hash``)."""
    out = {}
    for root, _, files in os.walk(dir_path):
        for f in sorted(files):
            p = os.path.join(root, f)
            out[p] = calculate_file_hash(p, hash_algo)
    return out


def check_dataset_change(dataset_dir, processed_dir_name="preprocessed"):
    """True if the on-disk dataset changed since preprocessing
    (reference ``check_dataset_change``)."""
    import json
    hash_file = os.path.join(dataset_dir, processed_dir_name,
                             "dataset_hash.json")
    if not os.path.exists(hash_file):
        return True
    with open(hash_file) as f:
        recorded = json.load(f)
    current = {p: h for p, h in calculate_dir_hash(dataset_dir).items()
               if processed_dir_name not in p}
    return recorded != current


def copy_or_convert_data(input_path, output_path, input_format="numpy",
                         output_format="numpy", in_memory=True,
                         is_feature=False):
    """Normalize a data file into the preprocessed layout (reference
    ``copy_or_convert_data``)."""
    arr = read_data(input_path, input_format, in_memory)
    save_data(arr, output_path, output_format)
    return output_path


def preprocess_ondisk_dataset(dataset_dir, include_original_edge_id=False,
                              force_preprocess=False, auto_cast_to_optimal_dtype=False):
    """Preprocess a metadata.yaml dataset into CSC binaries (reference
    ``ondisk_dataset.py preprocess_ondisk_dataset``): writes
    ``preprocessed/`` with the graph in CSC npz + a hash manifest,
    returns the path of the preprocessed metadata."""
    import json
    import yaml
    pre_dir = os.path.join(dataset_dir, "preprocessed")
    meta_out = os.path.join(pre_dir, "metadata.yaml")
    if (os.path.exists(meta_out) and not force_preprocess
            and not check_dataset_change(dataset_dir)):
        return meta_out
    os.makedirs(pre_dir, exist_ok=True)
    with open(os.path.join(dataset_dir, "metadata.yaml")) as f:
        meta = yaml.safe_load(f)
    edges_spec = meta["graph"]["edges"][0]
    src, dst = read_edges(dataset_dir,
                          "numpy" if edges_spec["path"].endswith(".npy")
                          else "csv", edges_spec["path"])
    n = meta["graph"]["nodes"][0]["num"]
    order = np.argsort(dst, kind="stable")
    indptr = np.searchsorted(dst[order], np.arange(n + 1))
    np.savez(os.path.join(pre_dir, "csc_graph.npz"),
             indptr=indptr.astype(np.int64),
             indices=src[order].astype(np.int64),
             original_edge_ids=order.astype(np.int64))
    with open(meta_out, "w") as f:
        yaml.safe_dump(meta, f)
    hashes = {p: h for p, h in calculate_dir_hash(dataset_dir).items()
              if "preprocessed" not in p}
    with open(os.path.join(pre_dir, "dataset_hash.json"), "w") as f:
        json.dump(hashes, f)
    return meta_out


def load_from_shared_memory(name):
    """Attach a CSCSamplingGraph published to shm (reference
    ``load_from_shared_memory``)."""
    from ..multiprocessing import hetero_from_shared_memory
    g = hetero_from_shared_memory(name)
    from .sampling_graph import from_dglgraph
    return from_dglgraph(g)


def minibatcher_default(batch, names):
    """Default minibatcher: wrap a batch of items into a MiniBatch
    (reference ``item_sampler.py minibatcher_default``)."""
    from .minibatch import MiniBatch
    mb = MiniBatch()
    if len(names) == 1:
        setattr(mb, names[0], batch)
    else:
        for name, part in zip(names, batch):
            setattr(mb, name, part)
    return mb


def calculate_range(is_distributed, total, world_size, rank, batch_size,
                    drop_last, drop_uneven_inputs):
    """This rank's [start, end) item range (reference
    ``calculate_range``)."""
    if not is_distributed or world_size <= 1:
        return 0, total
    per = total // world_size
    rem = total % world_size
    start = rank * per + min(rank, rem)
    end = start + per + (1 if rank < rem else 0)
    if drop_uneven_inputs:
        even = (total // world_size // batch_size) * batch_size
        end = min(end, start + even)
    return start, end


def count_split(total, world_size, rank):
    per = total // world_size
    rem = total % world_size
    return per + (1 if rank < rem else 0)


def get_attributes(obj):
    """Public data attributes of an object (reference
    ``get_attributes``)."""
    return [a for a in dir(obj)
            if not a.startswith("_") and not callable(getattr(obj, a))]


def get_nonproperty_attributes(obj):
    cls = type(obj)
    return [a for a in get_attributes(obj)
            if not isinstance(getattr(cls, a, None), property)]


def datapipe_graph_to_adjlist(datapipe):
    """Adjacency view of a datapipe chain (reference
    ``datapipe_graph_to_adjlist``): {stage: [upstream stages]}."""
    out = {}
    node = datapipe
    while node is not None:
        src = getattr(node, "source", None)
        out[type(node).__name__] = ([type(src).__name__]
                                    if src is not None else [])
        node = src
    return out


def add_reverse_edges(edges, reverse_etypes_mapping=None):
    """Reference graphbolt ``add_reverse_edges``: (src, dst) pair or
    per-etype dict -> with reversed pairs appended."""
    if isinstance(edges, dict):
        out = dict(edges)
        for et, (s, d) in edges.items():
            rt = (reverse_etypes_mapping or {}).get(et, et)
            if rt in out and rt != et:
                continue
            rs = np.concatenate([np.asarray(out.get(rt, (np.zeros(0,
                                 np.int64),))[0]), np.asarray(d)]) \
                if rt in out else np.asarray(d)
            rd = np.concatenate([np.asarray(out[rt][1]),
                                 np.asarray(s)]) if rt in out else \
                np.asarray(s)
            out[rt] = (rs, rd)
        return out
    s, d = edges
    return (np.concatenate([np.asarray(s), np.asarray(d)]),
            np.concatenate([np.asarray(d), np.asarray(s)]))


# on-disk metadata record names (reference impl/ondisk_metadata.py)
@dataclasses.dataclass
class OnDiskFeatureData:
    domain: str
    name: str
    path: str
    type: Optional[str] = None
    format: str = "numpy"
    in_memory: bool = True


class OnDiskFeatureDataDomain:
    NODE = "node"
    EDGE = "edge"
    GRAPH = "graph"


class OnDiskFeatureDataFormat:
    NUMPY = "numpy"
    TORCH = "torch"


class OnDiskGraphTopologyType:
    CSC = "FusedCSCSamplingGraph"


@dataclasses.dataclass
class OnDiskGraphTopology:
    type: str = OnDiskGraphTopologyType.CSC
    path: str = ""


@dataclasses.dataclass
class OnDiskTVTSetData:
    format: str = "numpy"
    path: str = ""
    in_memory: bool = True
    name: Optional[str] = None


@dataclasses.dataclass
class OnDiskTVTSet:
    type: Optional[str] = None
    data: Optional[list] = None


@dataclasses.dataclass
class OnDiskTaskData:
    name: Optional[str] = None
    num_classes: Optional[int] = None
    train_set: Optional[list] = None
    validation_set: Optional[list] = None
    test_set: Optional[list] = None


@dataclasses.dataclass
class OnDiskMetaData:
    dataset_name: Optional[str] = None
    graph: Optional[dict] = None
    feature_data: Optional[list] = None
    tasks: Optional[list] = None


@dataclasses.dataclass
class ExtraMetaData:
    include_original_edge_id: bool = False


MetaYaml = OnDiskMetaData


def load_yaml_with_sanity_check(yaml_path):
    """Parse + validate a metadata.yaml (reference
    ``load_yaml_with_sanity_check``)."""
    import yaml
    with open(yaml_path) as f:
        meta = yaml.safe_load(f)
    if "graph" not in meta:
        raise ValueError("metadata.yaml missing 'graph' section")
    return meta
