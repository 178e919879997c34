"""Out-of-core record store: chunked disk materialization must be
byte-identical to the in-RAM path (reference fast-loader semantics,
data_fast.py:24-119)."""

import numpy as np

from reviews4rec_tpu.data.batcher import Batcher


def test_disk_store_matches_ram(tmp_path, dataset, hp_base):
    hp = hp_base.replace(model_type="deepconn",
                         materialize_chunk_rows=3)
    ram = dataset.materialize(hp, "train")
    disk = dataset.materialize_to_disk(hp, "train", root=str(tmp_path))
    assert set(disk) == set(ram) | {"this_doc"} or set(disk) == set(ram)
    for k in ram:
        assert isinstance(disk[k], np.memmap), k
        assert np.array_equal(np.asarray(disk[k]), ram[k]), k
    # reopening is instant and identical
    again = dataset.materialize_to_disk(hp, "train", root=str(tmp_path))
    for k in ram:
        assert np.array_equal(np.asarray(again[k]), ram[k]), k


def test_narre_layout_disk(tmp_path, dataset, hp_base):
    hp = hp_base.replace(model_type="NARRE", materialize_chunk_rows=5)
    ram = dataset.materialize(hp, "val")
    disk = dataset.materialize_to_disk(hp, "val", root=str(tmp_path))
    for k in ram:
        assert np.array_equal(np.asarray(disk[k]), ram[k]), k


def test_batcher_streams_memmap(tmp_path, dataset, hp_base):
    hp = hp_base.replace(model_type="deepconn", materialize_chunk_rows=4)
    ram = dataset.materialize(hp, "train")
    disk = dataset.materialize_to_disk(hp, "train", root=str(tmp_path))
    for br, bd in zip(Batcher(ram, 8, shuffle=True, seed=3),
                      Batcher(dict(disk), 8, shuffle=True, seed=3)):
        for k in br:
            assert np.array_equal(br[k], bd[k]), k


def test_api_run_out_of_core(tmp_path, dataset, hp_base):
    """The product path trains identically from the disk store."""
    from reviews4rec_tpu.api import run

    hp = hp_base.replace(model_type="deepconn", epochs=1,
                         data_root=str(tmp_path / "data"),
                         log_dir=str(tmp_path / "logs"),
                         model_dir=str(tmp_path / "models"))
    m_ram, _, _ = run(hp, dataset)
    m_disk, _, _ = run(hp.replace(out_of_core=True,
                                  materialize_chunk_rows=16), dataset)
    assert m_ram["MSE"] == m_disk["MSE"]
    assert m_ram["HR@1"] == m_disk["HR@1"]


def test_negs_grid_disk_matches_ram(tmp_path, dataset, hp_base):
    """Candidate-grid ranking tensors ([M, C, ...], num_candidates x the
    split's footprint — the actual RAM hazard, reference
    data_fast.py:24-119) stream from the memmapped store byte-identical
    to the in-RAM grids."""
    hp = hp_base.replace(model_type="deepconn",
                         data_root=str(tmp_path / "data"),
                         materialize_chunk_rows=7)
    ram = dataset.materialize_negs(hp)
    disk = dataset.materialize_negs(hp.replace(out_of_core=True))
    assert set(ram) <= set(disk)
    for k in ram:
        assert isinstance(disk[k], np.memmap), k
        assert np.array_equal(np.asarray(disk[k]), ram[k]), k
    # grid shape preserved: [M, C, words]
    assert disk["user_doc"].ndim == 3
    # reopening hits the manifest, not a rebuild
    again = dataset.materialize_negs(hp.replace(out_of_core=True))
    assert np.array_equal(np.asarray(again["item_doc"]), ram["item_doc"])


def test_train_negs_grid_disk_matches_ram(tmp_path, dataset, hp_base):
    """Sampled training candidate grids (hp.loss ranking path) from the
    disk store, leakage removal included, byte-identical."""
    hp = hp_base.replace(model_type="NARRE",
                         data_root=str(tmp_path / "data"),
                         materialize_chunk_rows=5)
    ram = dataset.materialize_train_negs(hp, "train", seed=4)
    disk = dataset.materialize_train_negs(
        hp.replace(out_of_core=True), "train", seed=4)
    for k in ram:
        assert np.array_equal(np.asarray(disk[k]), ram[k]), k
    assert isinstance(disk["user_doc"], np.memmap)
    assert disk["user_doc"].ndim == 4  # [N, C, reviews, words]


def test_api_run_ranking_loss_out_of_core(tmp_path, dataset, hp_base):
    """Full product path with a ranking loss: train + rank-eval a review
    model entirely from memmapped grid stores, identical metrics."""
    from reviews4rec_tpu.api import run

    hp = hp_base.replace(model_type="deepconn", epochs=1, loss="BPR",
                         batch_size=16,
                         data_root=str(tmp_path / "data"),
                         log_dir=str(tmp_path / "logs"),
                         model_dir=str(tmp_path / "models"))
    m_ram, _, _ = run(hp, dataset)
    m_disk, _, _ = run(hp.replace(out_of_core=True,
                                  materialize_chunk_rows=16), dataset)
    assert m_ram["MSE"] == m_disk["MSE"]
    assert m_ram["HR@1"] == m_disk["HR@1"]
