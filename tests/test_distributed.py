"""Multi-host (DCN) smoke test: 2 jax.distributed CPU processes.

The multi-chip pipeline (gmr1_tpu.parallel) is written against a
jax.sharding.Mesh and is host-count agnostic; this test proves the same
shard_map program runs across a PROCESS boundary — the multi-host/DCN
deployment story (SURVEY.md §5.8: time-blocks across hosts, collectives
for halos) — not just on one process's virtual devices.

Two processes x 2 CPU devices each = a 4-device global mesh using gloo
collectives over TCP (the DCN analogue).  Each process feeds its local
shard of a time-sharded wideband block; the program runs the PFB
analysis with the ppermute halo exchange and psums a bank checksum.
Process 0 verifies the psum'd checksum against the unsharded analysis.
"""

import socket
import subprocess
import sys
import textwrap

import pytest

_CHILD = textwrap.dedent("""
    import sys
    sys.path.insert(0, "/root/repo")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental import multihost_utils

    port, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=2, process_id=pid)
    assert jax.device_count() == 4, jax.devices()
    assert jax.process_count() == 2

    from gmr1_tpu.channelizer import Channelizer
    from gmr1_tpu.channelizer.pfb import _analyze_block

    D = 4
    chz = Channelizer(1e6, 1525e6 + 31250 * 512, sps=4)
    ana = chz.analyzer
    halo_len = ana.p * ana.m
    n_local = 32 * 64
    rng = np.random.default_rng(0xD15)
    x = rng.standard_normal((D * n_local, 2)).astype(np.float32)

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("dev",))

    def step(x_local):
        tail = x_local[-halo_len:]
        halo = jax.lax.ppermute(
            tail, "dev", perm=[(i, (i + 1) % D) for i in range(D)])
        dev = jax.lax.axis_index("dev")
        halo = jnp.where(dev == 0, jnp.zeros_like(halo), halo)
        blk = jnp.concatenate([halo, x_local], axis=0)
        bank = _analyze_block(blk, ana.h_poly, ana.m, ana.p, ana.hop)
        return bank, jax.lax.psum(jnp.sum(jnp.abs(bank)), "dev")

    f = jax.jit(jax.shard_map(step, mesh=mesh, in_specs=P("dev"),
                              out_specs=(P("dev"), P())))
    # host-local shard -> global array (each process owns half the time)
    lo = pid * (D // 2) * n_local
    xg = multihost_utils.host_local_array_to_global_array(
        jnp.asarray(x[lo:lo + (D // 2) * n_local]), mesh, P("dev"))
    bank, chk = f(xg)
    got = float(np.asarray(jax.device_get(chk.addressable_data(0))))

    ref_bank = np.asarray(_analyze_block(
        jnp.concatenate([jnp.zeros((halo_len, 2), jnp.float32),
                         jnp.asarray(x)]), ana.h_poly, ana.m, ana.p,
        ana.hop))
    want = float(np.sum(np.abs(ref_bank)))
    assert abs(got - want) / want < 1e-5, (got, want)

    # local bank shards must ALSO match the unsharded rows elementwise
    r_local = n_local // ana.hop
    for k, s in enumerate(bank.addressable_shards):
        r0 = (pid * (D // 2) + k) * r_local
        np.testing.assert_allclose(np.asarray(s.data),
                                   ref_bank[r0:r0 + r_local],
                                   rtol=1e-4, atol=1e-4)
    print("DIST_OK", pid, got, flush=True)
""")


def test_two_process_distributed_analysis(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    procs = [subprocess.Popen(
        [sys.executable, str(script), port, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd="/root/repo") for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"DIST_OK {i}" in out, out[-3000:]
