"""Training CLI: ``python train.py --config configs/dyscene.yaml [key=value ...]``.

The TPU-native equivalent of the reference's torchrun entry point
(reference: train.py, README.md:115 ``torchrun --nproc_per_node 8 train.py
--config configs/dyscene.yaml``). One process drives the whole device mesh via
GSPMD — there is no per-rank process management; multi-host runs call
``jax.distributed.initialize()`` first (automatic on TPU pods).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/dyscene.yaml")
    parser.add_argument("overrides", nargs="*", help="key.path=value overrides")
    args = parser.parse_args(argv)

    import jax

    from motion324_tpu.utils.jit_cache import enable_compilation_cache
    enable_compilation_cache()
    from motion324_tpu.config import load_config
    from motion324_tpu.data.dyscene import DysceneDataset, PrefetchLoader
    from motion324_tpu.parallel.mesh import make_mesh
    from motion324_tpu.training.trainer import Trainer
    from motion324_tpu.utils.logging import log

    from motion324_tpu.parallel.distributed import (init_distributed,
                                                    process_seed)
    proc, nproc = init_distributed()

    cfg = load_config(args.config, args.overrides)
    mesh = make_mesh(cfg.get_path("mesh.dp", -1), cfg.get_path("mesh.mp", 1))
    t = cfg.training
    global_batch = int(t.batch_size_per_device) * mesh.shape["dp"] \
        * int(t.get("grad_accum_steps", 1))
    local_batch = global_batch // nproc
    log(f"devices={jax.device_count()} (local {jax.local_device_count()}) "
        f"process {proc}/{nproc} mesh={dict(mesh.shape)} "
        f"global_batch={global_batch} local_batch={local_batch}")

    # per-process seed offset so hosts draw disjoint samples (reference
    # setup.py:125 seeds rank-dependently; = DistributedSampler's role)
    seed = process_seed(int(t.get("seed", 0)))
    dataset = DysceneDataset(cfg, seed=seed)
    loader = PrefetchLoader(dataset, batch_size=local_batch,
                            num_workers=int(t.get("num_workers", 8)),
                            prefetch=int(t.get("prefetch_factor", 2)),
                            seed=seed)
    trainer = Trainer(cfg, loader, mesh=mesh)
    trainer.train()


if __name__ == "__main__":
    sys.exit(main())
