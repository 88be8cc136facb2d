"""Cluster launcher for dgl_tpu distributed training.

Reference: ``tools/launch.py`` (775 LoC ssh launcher).  Same contract:
given an ``ip_config`` file (one ``<ip> <port>`` server line per machine),
a partitioned dataset, and a training command, ssh to every machine and
start (a) one partition server per line and (b) ``num_trainers`` client
processes per machine, with the role env vars wired
(``DGL_TPU_ROLE/SERVER_ID/CLIENT_ID/NUM_CLIENTS/IP_CONFIG/PART_CONFIG``).

Usable as a module (``build_commands`` — unit-testable) or a CLI::

    python -m dgl_tpu.distributed.launch \
        --workspace /path --ip_config ip_config.txt \
        --part_config data/g.json --num_trainers 1 \
        "python train_dist.py ..."
"""
from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
from typing import List, Tuple


def read_machines(ip_config: str) -> List[Tuple[str, int]]:
    out = []
    with open(ip_config) as f:
        for line in f:
            line = line.strip()
            if line:
                ip, port = line.split()[:2]
                out.append((ip, int(port)))
    return out


def _env_str(env: dict) -> str:
    return " ".join(f"{k}={v}" for k, v in env.items())


def build_commands(ip_config: str, part_config: str, workspace: str,
                   train_cmd: str, num_trainers: int = 1,
                   python_bin: str = sys.executable,
                   extra_env: dict = None) -> List[Tuple[str, str]]:
    """Returns [(machine_ip, shell_command)] — servers first, then
    trainers (clients are numbered machine-major, trainer-minor)."""
    machines = read_machines(ip_config)
    num_machines = len(machines)
    num_clients = num_machines * num_trainers
    cmds: List[Tuple[str, str]] = []
    base_env = dict(extra_env or {})
    base_env["DGL_TPU_IP_CONFIG"] = ip_config
    base_env["DGL_TPU_PART_CONFIG"] = part_config
    base_env["DGL_TPU_NUM_CLIENTS"] = str(num_clients)
    # one fresh shared RPC session token per launch: only processes of
    # this job can complete the native handshake (see distributed/rpc.py)
    if "DGL_TPU_RPC_TOKEN" not in base_env:
        import secrets
        base_env["DGL_TPU_RPC_TOKEN"] = str(secrets.randbits(64))
    server_cmd = (f"{python_bin} -m dgl_tpu.distributed.launch "
                  f"--as_server --ip_config {ip_config} "
                  f"--part_config {part_config}")
    for sid, (ip, _) in enumerate(machines):
        env = dict(base_env, DGL_TPU_ROLE="server",
                   DGL_TPU_SERVER_ID=str(sid))
        cmds.append((ip, f"cd {workspace} && {_env_str(env)} {server_cmd} "
                         f"--server_id {sid} --num_clients {num_clients}"))
    cid = 0
    for ip, _ in machines:
        for _ in range(num_trainers):
            env = dict(base_env, DGL_TPU_ROLE="client",
                       DGL_TPU_CLIENT_ID=str(cid))
            cmds.append((ip, f"cd {workspace} && {_env_str(env)} "
                             f"{train_cmd}"))
            cid += 1
    return cmds


def _ssh_run(ip: str, cmd: str) -> subprocess.Popen:
    if ip in ("127.0.0.1", "localhost"):
        return subprocess.Popen(["bash", "-c", cmd])
    return subprocess.Popen(["ssh", "-o", "StrictHostKeyChecking=no", ip,
                             cmd])


def launch(args):
    cmds = build_commands(args.ip_config, args.part_config, args.workspace,
                          args.train_cmd, num_trainers=args.num_trainers)
    procs = [_ssh_run(ip, cmd) for ip, cmd in cmds]

    def _kill(sig, frame):
        for p in procs:
            p.terminate()
        sys.exit(1)

    signal.signal(signal.SIGINT, _kill)
    # trainers are the tail of the list; wait for them, then servers exit
    # via the client shutdown RPC
    ntrainers = len(read_machines(args.ip_config)) * args.num_trainers
    rc = 0
    for p in procs[-ntrainers:]:
        rc |= p.wait()
    for p in procs[:-ntrainers]:
        p.wait()
    sys.exit(rc)


def run_server(args):
    from .dist_context import DistGraphServer
    server = DistGraphServer(args.server_id, args.ip_config,
                             args.num_clients, args.part_config)
    server.start()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workspace", default=".")
    ap.add_argument("--ip_config", required=True)
    ap.add_argument("--part_config", required=True)
    ap.add_argument("--num_trainers", type=int, default=1)
    ap.add_argument("--as_server", action="store_true")
    ap.add_argument("--server_id", type=int, default=0)
    ap.add_argument("--num_clients", type=int, default=1)
    ap.add_argument("train_cmd", nargs="?", default="")
    args = ap.parse_args()
    if args.as_server:
        run_server(args)
    else:
        launch(args)


if __name__ == "__main__":
    main()
