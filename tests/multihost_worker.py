"""Worker process for the two-process jax.distributed validation
(test_sharded.py::test_multihost_two_process): each process contributes 2
virtual CPU devices; the global (2 proc × 2 dev) mesh runs the real
sharded top-k with its all_gather riding the in-process ("ICI") axis and
batch replication spanning processes ("DCN") — SURVEY §2.4's multi-host
story executed for real, not just imported."""

import os
import sys


def main() -> int:
    proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cbird_tpu.ops.dct_hash import split_u64
    from cbird_tpu.parallel.sharded import (init_distributed,
                                            make_multihost_mesh,
                                            sharded_hamming_topk)

    n = init_distributed(f"127.0.0.1:{port}", num_processes=nprocs,
                         process_id=proc_id)
    assert n == nprocs, f"process_count {n}"
    assert len(jax.devices()) == 2 * nprocs, jax.devices()
    mesh = make_multihost_mesh()
    assert mesh.axis_names == ("batch", "index")
    assert mesh.devices.shape == (nprocs, 2), mesh.devices.shape

    rng = np.random.default_rng(5)
    N, Q = 4096, 8
    hashes = rng.integers(1, 2**63, size=N, dtype=np.uint64)
    pairs = split_u64(hashes)
    valid = np.ones(N, dtype=bool)
    needles = pairs[:Q].copy()

    def put(arr, spec):
        return jax.make_array_from_callback(
            arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx])

    hs = put(pairs, P("index", None))
    vs = put(valid, P("index"))
    ns = put(needles, P())
    d, i = sharded_hamming_topk(mesh, ns, hs, vs, k=8)
    d_host = np.asarray(d.addressable_data(0))
    i_host = np.asarray(i.addressable_data(0))

    # exact check vs numpy brute force on the host
    ref = (np.bitwise_count(needles[:, None, 0] ^ pairs[None, :, 0])
           + np.bitwise_count(needles[:, None, 1] ^ pairs[None, :, 1]))
    order = np.argsort(ref, axis=1, kind="stable")[:, :8]
    ref_d = np.take_along_axis(ref, order, axis=1)
    assert np.array_equal(np.sort(d_host, axis=1), np.sort(ref_d, axis=1)), \
        (d_host, ref_d)
    assert (i_host[:, 0] == np.arange(Q)).all(), i_host[:, 0]
    print(f"MULTIHOST-OK proc={proc_id} mesh={mesh.devices.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
