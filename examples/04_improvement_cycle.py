"""Self-improvement fine-tuning cycle walkthrough.

Equivalent of the reference's improvement-cycle drivers
(`improvement_cycle_neg_examples_v15_4.py`, web `/run_IC` `app.py:634-793`):
for a set of target molecules, generate structural neighbors, simulate
their spectra, fine-tune the model on them, and re-test until the
teacher-forced sequence probability clears the threshold.

Run: python examples/04_improvement_cycle.py
"""

import jax

from multimodalspectraltransformer_tpu.models import mmt
from multimodalspectraltransformer_tpu.sim import factory
from multimodalspectraltransformer_tpu.train import improvement_cycle as ic
from multimodalspectraltransformer_tpu.train.molgen import MolGenConfig
from multimodalspectraltransformer_tpu.utils.config import MMTConfig, ModelConfig, TrainConfig

TARGETS = ["CC(=O)Nc1ccc(O)cc1", "CCOC(=O)c1ccccc1"]


def main() -> None:
    mcfg = ModelConfig(num_encoder_layers=1, num_decoder_layers=2, ffn_dim=256)
    cfg = MMTConfig(model=mcfg, train=TrainConfig(learning_rate=1e-3, num_epochs=2))

    target_records = factory.simulate_records(TARGETS)
    print(f"simulated {len(target_records)} targets")

    params = mmt.init_params(mcfg, jax.random.PRNGKey(0))
    icfg = ic.ImprovementCycleConfig(
        max_cycles=2,
        ic_threshold=0.9,  # high threshold so both demo cycles run
        steps_per_cycle=25,
        molgen=MolGenConfig(generations_per_target=10, max_trials=150),
        include_targets_in_training=True,
    )
    new_params, reports = ic.run_improvement_cycle(cfg, target_records, params, icfg)
    for r in reports:
        print(
            f"cycle {r.cycle}: {r.n_augmented} augmented molecules, "
            f"train loss {r.train_loss:.3f}, "
            f"corr_sampling_prob {r.summary.corr_sampling_prob:.4f}"
        )


if __name__ == "__main__":
    main()
