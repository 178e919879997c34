import json, statistics, time
from reviews4rec_tpu.config import HyperParams
from reviews4rec_tpu.data.corpus import ReviewDataset
from reviews4rec_tpu.models import build_model
from reviews4rec_tpu.train.loop import train_complete

ds = ReviewDataset.load("data/e2e/5_core")
for scan in (10, 20, 40):
    hp = HyperParams(model_type="deepconn++", dataset="e2e",
                     batch_size=256, epochs=10, use_pallas=True,
                     scan_steps=scan, cache_doc_embeds=True,
                     cache_entity=True, save_model=False)
    hp = ds.apply_to(hp)
    stats = {}
    t0 = time.time()
    train_complete(hp, build_model(hp, ds.word_vectors), ds,
                   stats=stats)
    eps = stats["epoch_examples_per_s"]
    steady = statistics.median(eps[2:])
    print(f"scan={scan}: steady-state median {steady:,.0f} ex/s "
          f"(epochs: {[round(e/1000,1) for e in eps]}k) wall {time.time()-t0:.0f}s",
          flush=True)
