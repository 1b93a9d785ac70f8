import sys, collections
from tensorflow.tsl.profiler.protobuf import xplane_pb2
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(sys.argv[1],"rb").read())
for pl in xs.planes:
    if pl.name != "/device:TPU:0": continue
    evmeta = pl.event_metadata
    stats = collections.Counter(); calls = collections.Counter(); info = {}
    for l in pl.lines:
        if l.name != "XLA Ops": continue
        for e in l.events:
            m = evmeta[e.metadata_id]
            key = m.name
            stats[key] += e.duration_ps / 1e9
            calls[key] += 1
            info[key] = m.display_name or ""
    total = sum(stats.values())
    print(f"total XLA op time: {total:.1f} ms over trace")
    for k, v in stats.most_common(30):
        print(f"{v:8.2f} ms x{calls[k]:5d}  {k}  | {info[k][:120]}")
