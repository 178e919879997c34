"""Training CLI: one command reproduces the run end-to-end
(reference workflow `python main.py` after editing hyper_params.py,
README.md:47-65)."""

import json

from reviews4rec_tpu.__main__ import build_parser, hp_from_args, main


def test_cli_end_to_end(tmp_path, dataset, capsys):
    data_root = tmp_path / "data"
    dataset.save(str(data_root / "synthetic" / "5_core"))
    rc = main([
        "--model_type", "MF_dot", "--dataset", "synthetic",
        "--data_root", str(data_root), "--epochs", "1",
        "--batch_size", "32", "--latent_size", "8",
        "--log_dir", str(tmp_path / "logs"),
        "--model_dir", str(tmp_path / "models"),
        "--json",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    metrics = json.loads(out[-1])
    assert "MSE" in metrics and "HR@1" in metrics
    # the normal flow persisted the best-val checkpoint (VERDICT item 5)
    assert (tmp_path / "models").glob("*.ckpt")


def test_cli_save_predictions(tmp_path, dataset, capsys):
    data_root = tmp_path / "data"
    dataset.save(str(data_root / "synthetic" / "5_core"))
    rc = main([
        "--model_type", "bias_only", "--dataset", "synthetic",
        "--data_root", str(data_root), "--epochs", "1",
        "--batch_size", "32",
        "--log_dir", str(tmp_path / "logs"),
        "--model_dir", str(tmp_path / "models"),
        "--save_predictions", "--json",
    ])
    assert rc == 0
    results = list((tmp_path / "logs").glob("*_results"))
    assert len(results) == 3  # train/test/val prediction artifacts
    for p in results:
        line = open(p).readline().split()
        assert len(line) == 2


def test_cli_missing_corpus(tmp_path, capsys):
    rc = main(["--model_type", "bias_only", "--dataset", "nope",
               "--data_root", str(tmp_path)])
    assert rc == 2
    assert "preprocess" in capsys.readouterr().err


def test_cli_flag_types():
    args = build_parser().parse_args([
        "--model_type", "NARRE", "--mesh_shape", "4,2",
        "--save_model", "false", "--eval_ks", "1,5,10",
        "--lr", "0.01"])
    hp = hp_from_args(args)
    assert hp.mesh_shape == (4, 2)
    assert hp.save_model is False
    assert hp.eval_ks == (1, 5, 10)
    assert hp.lr == 0.01
    assert hp.model_type == "NARRE"
