#!/usr/bin/env python
"""Two-stage training, mirroring notebooks/training_example.ipynb:

- stage 1: VAE on (noisy isolated -> clean isolated) pairs
- stage 2: deblender (frozen decoder) on (blended -> isolated) pairs
- transfer: warm-start a second survey from the first's weights
- band-count variant (cell 18 trains a different-band network)

Data comes from the on-device simulator (the reference loads external DC2
sets).  Run: python examples/training_example.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

import debvader_tpu as dt
from debvader_tpu.data.simulate import make_dataset


def main():
    data = make_dataset(jax.random.PRNGKey(0), n_train=128, n_val=32)
    hist_vae, hist_debl, state, model = dt.train_deblender(
        survey_name="sim_demo",
        from_survey=None,
        epochs=3,
        training_data_vae=data["vae"][0],
        validation_data_vae=data["vae"][1],
        training_data_deblender=data["deblender"][0],
        validation_data_deblender=data["deblender"][1],
        nb_of_bands=6,
        batch_size=32,
        with_callbacks=True,
        verbose=1,
        train_cfg=dt.TrainConfig(batch_size=32, kl_anneal_steps=12),
        weights_dir="/tmp/debvader_tpu_weights",
    )
    print("vae loss:", hist_vae["loss"])
    print("deblender loss:", hist_debl["loss"])

    # transfer to a 'new survey' warm-started from sim_demo
    hist2, _, _, _ = dt.train_deblender(
        "sim_demo_transfer", "sim_demo", 1,
        data["vae"][0], data["vae"][1],
        data["deblender"][0], data["deblender"][1],
        nb_of_bands=6, batch_size=32, verbose=1,
        weights_dir="/tmp/debvader_tpu_weights",
    )
    print("transfer vae loss:", hist2["loss"])

    # band-count transfer (BASELINE config 5): warm-start a Euclid-like
    # 4-band model from the 6-band sim_demo checkpoint.  The band mismatch
    # routes through training/transfer.transfer_band_count — every
    # band-independent tensor (latent head, interior convs, dense layers,
    # PReLUs) carries over; the band-shaped layers reinitialize.
    data4 = make_dataset(jax.random.PRNGKey(1), n_train=64, n_val=16, bands=4)
    hist4, _, _, _ = dt.train_deblender(
        "sim_demo_4band", "sim_demo", 1,
        data4["vae"][0], data4["vae"][1],
        data4["deblender"][0], data4["deblender"][1],
        nb_of_bands=4, batch_size=32, verbose=1,
        weights_dir="/tmp/debvader_tpu_weights",
    )
    print("4-band warm-started vae loss:", hist4["loss"])

    # frozen-encoder latent reuse on the transferred weights: freeze the
    # carried-over encoder and fine-tune only the (reinitialized) decoder
    from debvader_tpu.training.checkpoint import load_weights
    from debvader_tpu.training.train import create_train_state, train_network
    from debvader_tpu.training.transfer import transfer_band_count

    vars6 = load_weights("sim_demo", weights_dir="/tmp/debvader_tpu_weights")
    vars4 = transfer_band_count(vars6, dt.ModelConfig(nb_of_bands=4))
    model4 = dt.create_model_vae(dt.ModelConfig(nb_of_bands=4))
    state4 = create_train_state(
        model4, dt.TrainConfig(batch_size=32), variables=vars4, freeze="encoder"
    )
    state4, hist4f = train_network(
        model4, state4, 1, data4["vae"][0], data4["vae"][1], 32, verbose=1,
        train_cfg=dt.TrainConfig(batch_size=32),
    )
    print("4-band frozen-encoder loss:", hist4f["loss"])


if __name__ == "__main__":
    main()
