"""Multi-host eval collection machinery (parallel/mesh.py).

Single-process unit tests run on the virtual 8-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8): `gather` /
`local_rows` on sharded arrays, `collect_results` identity.  The
true 2-process path (non-addressable shards -> process_allgather /
pickled-bytes exchange) runs as a jax.distributed 2-process CPU smoke
test in a subprocess pair (slow tier).

Reference parity surface: `collect_results_cpu`/`collect_results_gpu`
(ref mmdet/apis/test.py:235-308) and the DistributedSampler feeding
contract (ref mmdet/datasets/builder.py:155-166).
"""

import os
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hrfuser_tpu.parallel.mesh import (collect_results, gather,
                                       host_local_to_global, local_rows,
                                       make_mesh, shard_batch)


def test_gather_sharded_array_roundtrip():
    mesh = make_mesh()
    x = np.arange(mesh.size * 3 * 4, dtype=np.float32).reshape(
        mesh.size * 3, 4)
    xs = shard_batch(mesh, x)
    out = gather(xs)
    np.testing.assert_array_equal(out, x)
    assert isinstance(out, np.ndarray)


def test_local_rows_single_process_equals_full():
    mesh = make_mesh()
    x = np.arange(mesh.size * 2 * 3, dtype=np.float32).reshape(
        mesh.size * 2, 3)
    xs = shard_batch(mesh, x)
    np.testing.assert_array_equal(local_rows(xs), x)
    np.testing.assert_array_equal(local_rows(x), x)      # numpy passthrough


def test_collect_results_single_process_identity():
    res = [dict(boxes=np.zeros((2, 4)), meta={'id': 7})]
    assert collect_results(res) is res


def test_host_local_to_global_single_process():
    mesh = make_mesh()
    batch = {'img': np.ones((mesh.size, 2, 2, 3), np.float32)}
    out = host_local_to_global(mesh, batch)
    assert out['img'].shape == (mesh.size, 2, 2, 3)


_WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np
    import jax
    jax.config.update('jax_platforms', 'cpu')
    pid = int(sys.argv[1])
    jax.distributed.initialize(coordinator_address='localhost:%s',
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from hrfuser_tpu.parallel.mesh import (collect_results, gather,
                                           host_local_to_global, local_rows,
                                           make_mesh)
    mesh = make_mesh()            # spans both processes' devices
    nloc = jax.local_device_count()
    local = np.arange(nloc * 3, dtype=np.float32).reshape(nloc, 3) \\
        + 100 * pid
    g = host_local_to_global(mesh, local)
    assert not g.is_fully_addressable
    # local_rows returns exactly this process's slice
    np.testing.assert_array_equal(local_rows(g), local)
    # gather returns the full global value on every process
    full = gather(g)
    assert full.shape == (2 * nloc, 3)
    np.testing.assert_array_equal(full[:nloc] if pid == 0 else full[nloc:],
                                  local)
    # collect_results merges per-process object lists in process order
    merged = collect_results([{'pid': pid, 'n': nloc}])
    assert [m['pid'] for m in merged] == [0, 1]
    print('MULTIHOST_OK', pid)
""")


@pytest.mark.slow
def test_two_process_cpu_distributed_smoke(tmp_path):
    port = 12355 + os.getpid() % 1000
    script = tmp_path / 'worker.py'
    script.write_text(_WORKER % port)
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=os.getcwd(),
               XLA_FLAGS='--xla_force_host_platform_device_count=2',
               HRFUSER_NO_JAX_CACHE='1')
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env)
             for i in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {i} failed:\n{out}'
        assert f'MULTIHOST_OK {i}' in out
