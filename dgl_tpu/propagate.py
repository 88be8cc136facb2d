"""Message propagation along traversal orders (reference
``python/dgl/propagate.py``): prop_nodes/prop_edges with BFS/topo orders."""
from __future__ import annotations

from . import traversal


def prop_nodes(g, nodes_generator, message_func, reduce_func,
               apply_node_func=None, etype=None):
    from . import core
    for frontier in nodes_generator:
        core.pull_inplace(g, frontier, message_func, reduce_func,
                          apply_node_func, etype=etype)
    return g


def prop_nodes_bfs(g, source, message_func, reduce_func,
                   apply_node_func=None, reverse=False):
    return prop_nodes(g, traversal.bfs_nodes_generator(g, source, reverse),
                      message_func, reduce_func, apply_node_func)


def prop_nodes_topo(g, message_func, reduce_func, apply_node_func=None,
                    reverse=False):
    return prop_nodes(g, traversal.topological_nodes_generator(g, reverse),
                      message_func, reduce_func, apply_node_func)


def prop_edges(g, edges_generator, message_func, reduce_func,
               apply_node_func=None, etype=None):
    from . import core
    for eids in edges_generator:
        core.send_and_recv_inplace(g, eids, message_func, reduce_func,
                                   apply_node_func, etype=etype)
    return g


def prop_edges_dfs(g, source, message_func, reduce_func,
                   apply_node_func=None, reverse=False):
    return prop_edges(g, traversal.dfs_edges_generator(g, source, reverse),
                      message_func, reduce_func, apply_node_func)
