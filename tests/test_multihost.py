"""Multi-host runtime validated for real: two OS processes form a JAX
distributed cluster over localhost (CPU backend, 1 device each), build a
global 2-device mesh, and reduce across HOSTS — the jax.distributed
bring-up that `parallel/multihost.py::initialize` wraps (SURVEY §2.3
"Elasticity / multi-node"). No TPU pod required."""

import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ["MGR_REPO"])
    import jax
    jax.config.update("jax_platforms", "cpu")

    from mgr_tpu.parallel import multihost

    pid = int(os.environ["MGR_PID"])
    multihost.initialize(
        coordinator_address=os.environ["MGR_COORD"],
        num_processes=2,
        process_id=pid,
    )
    info = multihost.process_info()
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 2, info
    assert multihost.is_primary() == (pid == 0)

    # Cross-host reduction over a global mesh: each host contributes
    # its (pid + 1) and both must see the global sum 3.
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    mesh = jax.make_mesh((2,), ("data",))
    local = jnp.full((1,), float(pid + 1))
    global_arr = jax.make_array_from_process_local_data(
        jax.NamedSharding(mesh, P("data")), local, global_shape=(2,)
    )
    total = jax.jit(
        jnp.sum, out_shardings=jax.NamedSharding(mesh, P())
    )(global_arr)
    assert float(total) == 3.0, float(total)
    print(f"worker {pid} ok")
""")


def test_two_process_cluster_psum(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update({
            "MGR_REPO": REPO, "MGR_PID": str(pid), "MGR_COORD": coord,
            "JAX_PLATFORMS": "cpu",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [p.communicate(timeout=300) for p in procs]
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid}:\n{err[-2000:]}"
        assert f"worker {pid} ok" in out
