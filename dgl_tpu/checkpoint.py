"""Checkpoint / resume (SURVEY §5.3-5.4).

The reference delegates model checkpointing to torch.save and has no
elastic recovery; its failure story is "restart and reload".  On TPU the
equivalent contract is slice-restart + checkpoint-resume, so this module
makes that first-class:

* ``save_checkpoint / load_checkpoint`` — orbax-backed train-state
  snapshots (params, opt state, step, rng, and arbitrary pytrees),
  atomic on-disk layout, keep-last-k rotation;
* graph structure/features persist through ``dgl_tpu.data.save_graphs``;
* mid-epoch sampler resume: ``epoch_state()`` captures (epoch, batch
  cursor, numpy rng state) from a ``DataLoader`` so a restarted job
  continues from the same shuffle position — the reference has no such
  facility (SURVEY §5.4 'no mid-epoch resume of samplers').
"""
from __future__ import annotations

import os
import pickle
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(directory: str, state, step: int,
                    keep_last: int = 3) -> str:
    """Atomically write a checkpoint for ``step``; returns its path."""
    os.makedirs(directory, exist_ok=True)
    tmp = os.path.join(directory, f".tmp_step_{step}")
    final = os.path.join(directory, f"step_{step}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(tmp, "state"),
                   jax.device_get(state))
    except Exception:
        # fallback: pickle of host pytree (works everywhere)
        with open(os.path.join(tmp, "state.pkl"), "wb") as f:
            pickle.dump(jax.device_get(state), f, protocol=5)
    with open(os.path.join(tmp, "STEP"), "w") as f:
        f.write(str(step))
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
    _rotate(directory, keep_last)
    return final


def _rotate(directory: str, keep_last: int):
    steps = sorted(int(d.split("_")[1]) for d in os.listdir(directory)
                   if d.startswith("step_"))
    for s in steps[:-keep_last]:
        shutil.rmtree(os.path.join(directory, f"step_{s}"),
                      ignore_errors=True)


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(directory)
             if d.startswith("step_")]
    return max(steps) if steps else None


def load_checkpoint(directory: str, step: Optional[int] = None,
                    target=None):
    """Load the checkpoint at ``step`` (default: latest).  Returns
    (state, step) or (None, None) when absent — callers start fresh."""
    step = step if step is not None else latest_step(directory)
    if step is None:
        return None, None
    path = os.path.join(directory, f"step_{step}")
    pkl = os.path.join(path, "state.pkl")
    if os.path.exists(pkl):
        with open(pkl, "rb") as f:
            return pickle.load(f), step
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    state = ckptr.restore(os.path.join(path, "state"), item=target)
    return state, step


# ---------------------------------------------------------------------------
# mid-epoch sampler resume

def epoch_state(epoch: int, batch_index: int, rng: np.random.Generator
                ) -> Dict[str, Any]:
    """Capture loader position: store alongside the model checkpoint."""
    return {"epoch": int(epoch), "batch_index": int(batch_index),
            "rng_state": rng.bit_generator.state}


def restore_epoch_state(state: Dict[str, Any]):
    """Returns (epoch, batch_index, rng) reproducing the shuffle order."""
    rng = np.random.default_rng()
    rng.bit_generator.state = state["rng_state"]
    return state["epoch"], state["batch_index"], rng
