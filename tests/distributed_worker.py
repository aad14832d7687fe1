"""Worker for the multi-process distributed test (SURVEY.md s4 item 4:
multi-host logic tested with jax.distributed on localhost processes).

Each process owns 4 virtual CPU devices; the global mesh is
(channels=2, time=4) across 2 processes.  Run via tests/test_multiprocess.py.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.device_count() == 8, jax.device_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from tests.test_closed_loop import build_ensemble, modulate
    from dabtools_tpu import constants as C
    from dabtools_tpu.parallel.mesh import make_receiver_mesh
    from dabtools_tpu.parallel.timeblock import halo_sizes, timeblock_receiver

    n_time, f_own, warmup = 4, 6, 5
    g0 = warmup + 1
    ens = build_ensemble()
    n_frames_total = g0 + n_time * f_own + 1
    x, payload_bytes = modulate(ens, n_frames_total, seed=55)

    fr = C.MODE_I.frame_size
    lh, rh = halo_sizes(warmup)
    span_start = g0 * fr
    span_len = n_time * f_own * fr
    span = np.stack([x[span_start:span_start + span_len]] * 2)
    prefix = np.stack([x[span_start - lh:span_start]] * 2)
    suffix = np.stack([x[span_start + span_len:
                         span_start + span_len + rh]] * 2)

    mesh = make_receiver_mesh(n_channels=2, n_time=n_time)
    fn = timeblock_receiver(mesh, ens, frames_per_shard=f_own,
                            warmup_frames=warmup)

    def shard(arr, spec):
        sh = jax.sharding.NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx])

    P = jax.sharding.PartitionSpec
    xs = shard(span, P("channels", "time"))
    ps = shard(prefix, P("channels"))
    ss = shard(suffix, P("channels"))

    out = fn(xs, ps, ss, g0)
    sub = ens.subchannels[0]
    got = multihost_utils.process_allgather(
        out["subch"][str(sub.subchid)], tiled=True)
    got = np.asarray(got)

    n_rows = n_time * f_own * 4
    assert got.shape[0] == 2
    ok = 0
    for c in range(2):
        for j in range(n_rows):
            n = g0 * 4 + j - 15
            if n < 0:
                continue
            assert got[c, j].tobytes() == payload_bytes[1][n].tobytes(), \
                f"proc{pid}: channel {c} row {j} mismatch"
            ok += 1
    print(f"proc {pid}: OK {ok} logical frames bit-exact across "
          f"2-process mesh {dict(mesh.shape)}", flush=True)


if __name__ == "__main__":
    main()
