# Sound one-sided confirmation of the engine's dedup_semantic answer at
# native sf1.0: build the SAME 40k-row relation (orig + e0+0.5 shifted,
# id collisions included), the SAME 4x8 hyperplane sign signatures
# (Similarity.hyperplanes LCG), then union-find over a SPANNING SUBSET of
# the verified pair graph (per bucket: anchor->member and member->next
# edges that pass exact cosine >= 0.9). Every union corresponds to a real
# verified pair, so components here can only be COARSER-or-equal splits of
# the true clustering being MERGED less -- if even this subset connects all
# ids into one component with min 0, the true keep-one answer is exactly {0}.
import duckdb, numpy as np

e = duckdb.sql("SELECT vec_id, embedding FROM read_parquet('/tmp/native-sf1/embeddings.parquet/*.parquet') ORDER BY vec_id").fetchnumpy()
ids = e['vec_id']
V = np.stack([np.asarray(x, dtype=np.float64) for x in e['embedding']])
n, dim = V.shape
assert dim == 64
# augmented relation: (id, vec) rows
shift = V.copy(); shift[:, 0] += 0.5
rows_id = np.concatenate([ids, ids + 10000])
rows_v = np.concatenate([V, shift])
# planes: k = bands*rowsPerBand = 32, LCG fill row-major
x = np.int64(0x5EED5EED)
planes = np.empty((32, 64))
lcg_a, lcg_c = np.int64(6364136223846793005), np.int64(1442695040888963407)
with np.errstate(over='ignore'):
    for i in range(32):
        for j in range(64):
            x = x * lcg_a + lcg_c
            planes[i, j] = -1.0 if x < 0 else 1.0
dots = rows_v @ planes.T            # (2n, 32)
bits = (dots > 0)
norms = np.sqrt((rows_v * rows_v).sum(1))
parent = np.arange(30000)
def find(a):
    while parent[a] != a:
        parent[a] = parent[parent[a]]
        a = parent[a]
    return a
def union(a, b):
    ra, rb = find(a), find(b)
    if ra != rb: parent[max(ra, rb)] = min(ra, rb)
def cos(i, j):
    return float(rows_v[i] @ rows_v[j]) / (norms[i] * norms[j])
unions = 0
for band in range(4):
    sig = bits[:, band*8:(band+1)*8]
    key = (sig * (1 << np.arange(8))).sum(1)
    order = np.argsort(key, kind='stable')
    ks = key[order]
    start = 0
    for end in list(np.nonzero(np.diff(ks))[0] + 1) + [len(ks)]:
        members = order[start:end]; start = end
        if len(members) < 2: continue
        anchor = members[0]
        prev = members[0]
        for m in members[1:]:
            for other in (anchor, prev):
                if rows_id[m] != rows_id[other] and find(rows_id[m]) != find(rows_id[other]):
                    if cos(m, other) >= 0.9:
                        union(rows_id[m], rows_id[other]); unions += 1
            prev = m
present = np.unique(rows_id)
roots = set(find(i) for i in present)
print(f"n_rows={len(rows_id)} ids={len(present)} spanning_unions={unions} components={len(roots)} roots_min={min(roots)} roots={sorted(roots)[:10]}")
