import json, sys, time
import numpy as np
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
from fspann_query_system_spark.session import get_spark
from fspann_query_system_spark.lsh.params import LshConfig, fit_params
from fspann_query_system_spark.query.ann import AnnIndex, search_batch
from fspann_query_system_spark.crypto.keys import KeyManager
from fspann_query_system_spark.crypto.aes import encrypt_vectors
from scale_bench import DIM, K, make_data, materialize

n, nq = 1_000_000, 1000
spark = get_spark("sweep-1m-sq8", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
rng = np.random.default_rng(7)
X = make_data(n, rng)
vec = materialize(spark, X)
qi = rng.choice(n, nq, replace=False)
queries = spark.createDataFrame([(int(i), X[i].tolist()) for i in qi],
                                "q_id LONG, vector ARRAY<DOUBLE>")
sub = qi[:50]
gt = {}
for q in sub:
    d2 = ((X - X[q]) ** 2).sum(1)
    gt[int(q)] = set(np.argsort(d2, kind="stable")[:K].tolist())
print("oracle ready", flush=True)

cfg = LshConfig(dim=DIM, seed=11, m=26, lam=2, tables=8, divisions=2,
                probes=8, block_size=128, refinement_limit=8000)
t0 = time.time()
params = fit_params(X[:10000], cfg)
idx = AnnIndex.build(vec, cfg, params=params)
idx.codes.count(); idx.routing()
print(f"build: {time.time()-t0:.1f}s", flush=True)
idx8 = idx.with_sq8(); idx8.sq8_codes.count()
km = KeyManager(master=bytes(32))
keys_bc = spark.sparkContext.broadcast(km.key_map())
enc = encrypt_vectors(vec, keys_bc, km.current_version).persist(); enc.count()
idx8_enc = idx8.with_encrypted_points(enc, keys_bc)
print("encrypted + sq8 ready", flush=True)

# (probes, refine, rerank): flagship today is (8, 8000, 4) -> 0.798
for probes, refine, rerank in [(8, 8000, 4), (16, 16384, 8),
                               (16, 32768, 8), (32, 65536, 16)]:
    t0 = time.time()
    res = search_batch(idx8_enc, queries, k=K, probes=probes,
                       refinement_limit=refine, sq8_rerank=rerank).collect()
    dt = time.time() - t0
    got = {}
    for r in res: got.setdefault(r.q_id, set()).add(r.id)
    rec = float(np.mean([len(got.get(q, set()) & gt[q]) / K for q in gt]))
    print(json.dumps(dict(n=n, probes=probes, refine=refine, rerank=rerank,
                          ms_per_q=round(1000*dt/nq, 1),
                          recall=round(rec, 3))), flush=True)
