import sys, numpy as np
sys.path.insert(0, "/root/repo")
from trefoil_spark.sources.hdf5 import NC4File
# driver-side whole-array read (INDEPENDENT of the distributed chunk->tile path)
nc = NC4File("/root/repo/tests/data/tmin.nc")
arr = nc.read("tmin")          # south-first (ascending lat)
lat = nc.read("lat")
nf = arr[::-1] if lat[0] < lat[-1] else arr   # north-first grid space
h, w = nf.shape
rows = []
for ty in range((h + 255)//256):
    for tx in range((w + 255)//256):
        blk = nf[ty*256:(ty+1)*256, tx*256:(tx+1)*256].astype(np.float64)
        ok = ~np.isnan(blk)
        fs = int(np.floor(blk[ok]).astype(np.int64).sum())
        rows.append((ty, tx, fs, int(ok.sum())))
print("_NC4_TILE_FIXTURE = [")
for r in rows:
    print(f"    {r},")
print("]")
