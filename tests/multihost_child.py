"""Child process for the two-process multi-host train-step test.

NOT a test module (no ``test_`` prefix). Launched twice by
tests/test_multihost.py with a distinct process_id; initializes the
jax.distributed runtime over localhost, builds the SAME config/state as
the parent (deterministic init from the same seed), assembles its local
half of the global batch into global arrays via the library sharding
helpers, runs ONE fused train step over a 4x2 data x spatial mesh
spanning both processes (gradient reductions cross process boundaries
over the gloo backend), and writes its metrics to JSON for the parent
to compare against the single-process step.

Usage: python multihost_child.py <process_id> <num_processes> <port> <out.json>
"""

import json
import os
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
# repeat -m slow runs skip the children's mesh-step compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu_mh")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    out_path = Path(sys.argv[4])

    from one_to_many_gan_tpu.parallel import distributed

    distributed.ensure_initialized(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc

    import numpy as np

    from one_to_many_gan_tpu.config import load_config
    from one_to_many_gan_tpu.core.state import Models, init_train_state
    from one_to_many_gan_tpu.core.train_step import Batches, make_train_step
    from one_to_many_gan_tpu.parallel import make_mesh, replicate, shard_batch
    from tests.helpers import write_tiny_config

    tmp = out_path.parent / f"cfg_{pid}"
    tmp.mkdir(exist_ok=True)
    config = load_config(
        write_tiny_config(
            tmp, batch_size=8, tpu_section="\n[tpu]\nspatial_parallel = 2\n"
        )
    )
    # checkpoints must land in ONE directory shared by both processes
    # (Orbax coordinates the multi-process commit itself)
    config["training"]["checkpoint_directory"] = out_path.parent / "ckpt_shared"
    models = Models(config)
    state = init_train_state(config, models, jax.random.key(0))

    # The SAME global batch as the parent (same seed); this process
    # contributes its disjoint local rows, exactly as the data pipeline's
    # host sharding would.
    rng = np.random.default_rng(0)
    h, w = config["data"]["image_size"]
    b = config["training"]["batch_size"]

    def mk():
        return (rng.random((b, h, w, 1)) * 2 - 1).astype(np.float32)

    global_batches = Batches(mk(), mk(), mk(), mk())
    local, off = distributed.local_batch_slice(b)
    local_batches = Batches(*(x[off : off + local] for x in global_batches))

    mesh = make_mesh(4, 2)  # spans both processes: dp crosses hosts
    step = make_train_step(config, models, mesh)
    state_r = replicate(mesh, state)
    batches_r = Batches(*(shard_batch(mesh, x) for x in local_batches))
    new_state, metrics = jax.jit(step)(state_r, batches_r, jax.random.key(6))

    payload = {k: float(v) for k, v in metrics.items()}
    payload["step"] = int(new_state.step)

    # --- multi-host checkpoint round-trip (VERDICT r3 #3): save the
    # stepped state across both processes, then restore it into a FRESH
    # differently-seeded template via the sharding-aware abstract tree —
    # impossible without target shardings (Orbax cannot assemble a
    # cross-host array from shape/dtype alone).
    import jax.numpy as jnp

    from one_to_many_gan_tpu.core.trainer import (
        _checkpoint_manager,
        restore_checkpoint,
        save_checkpoint,
    )

    mgr = _checkpoint_manager(config)
    save_checkpoint(mgr, 1, new_state)
    template = replicate(
        mesh, init_train_state(config, models, jax.random.key(9))
    )
    restored, start = restore_checkpoint(_checkpoint_manager(config), template)
    diffs = [
        jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
        for a, b in zip(
            jax.tree.leaves(restored), jax.tree.leaves(new_state), strict=True
        )
    ]
    payload["restore_step"] = int(start)
    payload["restore_max_diff"] = float(jnp.max(jnp.stack(diffs)))
    # shardings come from the TEMPLATE (the stepped state's buffer leaf may
    # carry step-output sharding; a resume starts from replicate() placement)
    payload["restore_shardings_ok"] = all(
        a.sharding.is_equivalent_to(t.sharding, a.ndim)
        for a, t in zip(
            jax.tree.leaves(restored), jax.tree.leaves(template), strict=True
        )
    )
    out_path.write_text(json.dumps(payload))
    print(f"multihost child {pid} ok")


if __name__ == "__main__":
    main()
