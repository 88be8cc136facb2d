"""SPMD multi-chip full-graph GCN over a device mesh (the pjit plane;
run with XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu for a virtual mesh, or on a real slice)."""
import numpy as np
import jax

import __graft_entry__  # reuses the driver's sharded train-step recipe


def main():
    n = min(8, len(jax.devices()))
    __graft_entry__.dryrun_multichip(n)


if __name__ == "__main__":
    main()
