"""Train a small MMT and run the full evaluation harness.

End-to-end slice: synthetic spectra -> pjit training -> greedy + fan-out
multinomial sampling -> filters -> spectral-error ranking -> top-k metrics
(the reference's `run_test_mns_performance_CLIP_3` pipeline,
`mmt_result_test_functions_15_4.py:504`).

Run: python examples/02_train_and_evaluate.py
"""

import jax

from multimodalspectraltransformer_tpu.data import pipeline as dp
from multimodalspectraltransformer_tpu.eval import harness
from multimodalspectraltransformer_tpu.train import run_training
from multimodalspectraltransformer_tpu.utils.config import (
    DecodeConfig, MMTConfig, ModelConfig, TrainConfig,
)


def main() -> None:
    mcfg = ModelConfig(num_encoder_layers=1, num_decoder_layers=2, ffn_dim=256)
    cfg = MMTConfig(model=mcfg, train=TrainConfig(learning_rate=1e-3, num_epochs=4))

    records = dp.synthetic_dataset(64, seed=0)
    train_recs, eval_recs = records[:48], records[48:56]

    loader = dp.Loader(train_recs, mcfg, batch_size=16)
    result = run_training(cfg, loader, max_steps=60)
    print(f"trained {result.steps} steps, loss {result.train_loss:.3f}")

    dcfg = DecodeConfig(max_len=32, fanout=16, multinom_runs=4, max_temp_rounds=3)
    results, summary = harness.evaluate_molecules(
        eval_recs, result.state.params, mcfg, dcfg, simulate_errors=True,
    )
    print("greedy validity:", summary.greedy_validity)
    print("greedy exact:", summary.greedy_exact)
    print("MNS top-rank exact:", summary.mns_exact)
    print("mean best tanimoto:", summary.avg_best_tanimoto)


if __name__ == "__main__":
    main()
