"""Host-resident-data training throughput: train_network with and without
steps_per_dispatch (VERDICT r3 #3).

The reference's ``net.fit`` (training/train.py:27-37) trains from host
numpy arrays; the r3 chunked trainer only covered device-generated batch
streams.  This measures the drop-in ``train_network`` path on a host
dataset through this environment's tunnel:

  - per-step  (steps_per_dispatch=1): one host dispatch per batch
  - gather    (steps_per_dispatch=K, device_dataset=True): dataset uploaded
    to HBM once, then K steps per dispatch over uploaded *indices*
  - superbatch(steps_per_dispatch=K, device_dataset=False): K batches
    re-uploaded per dispatch (the mesh-compatible form)

Wall time is measured over epochs after the first (steady state: dataset
resident, programs compiled).  Usage:
    python scripts/bench_train_hostdata.py [n] [batch] [K] [epochs]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

from debvader_tpu.config import ModelConfig, TrainConfig
from debvader_tpu.models.vae import DeblenderVAE
from debvader_tpu.training.train import create_train_state, train_network
from debvader_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

# 4096 stamps = ~0.7 GB per array; this environment's host link moves
# 5-25 MB/s, so the one-time gather-mode upload is already minutes — real
# hosts pay ~0.1 s.  Larger N only stretches the upload phase.
N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 256
K = int(sys.argv[3]) if len(sys.argv) > 3 else 16
EPOCHS = int(sys.argv[4]) if len(sys.argv) > 4 else 4


def run(name, spd, device_dataset, epochs, scan_epochs=False):
    model = DeblenderVAE(ModelConfig(dtype="bfloat16"))
    cfg = TrainConfig(batch_size=BATCH, seed=0)
    rng = np.random.default_rng(0)
    y = rng.normal(size=(N, 59, 59, 6)).astype(np.float32)
    x = (y + 0.05 * rng.normal(size=y.shape)).astype(np.float32)
    xv = x[:512].copy()
    yv = y[:512].copy()
    state = create_train_state(model, cfg)
    # epoch 1 = compile + (gather mode) the one-time dataset upload
    t0 = time.perf_counter()
    state, _ = train_network(
        model, state, 1, (x, y), (xv, yv), BATCH, verbose=0, train_cfg=cfg,
        steps_per_dispatch=spd, device_dataset=device_dataset,
        scan_epochs=scan_epochs,
    )
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, _ = train_network(
        model, state, epochs, (x, y), (xv, yv), BATCH, verbose=0,
        train_cfg=cfg, steps_per_dispatch=spd, device_dataset=device_dataset,
        scan_epochs=scan_epochs,
    )
    dt = (time.perf_counter() - t0) / epochs
    print(
        f"{name:>11}: first epoch {t_first:6.1f} s, steady {dt:6.2f} s/epoch "
        f"= {N / dt:8.0f} stamps/s  ({N} stamps, batch {BATCH}, K={spd})",
        flush=True,
    )


def main():
    print(f"backend={jax.default_backend()}  n={N} batch={BATCH} K={K}",
          flush=True)
    # r5: the whole fit in one dispatch (scan_epochs) vs the K-step scan
    run("scan-epochs", 1, None, EPOCHS, scan_epochs=True)
    run("gather", K, True, EPOCHS)
    run("per-step", 1, None, 1)
    run("superbatch", K, False, 1)


if __name__ == "__main__":
    main()
