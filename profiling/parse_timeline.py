import sys
from tensorflow.tsl.profiler.protobuf import xplane_pb2
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(sys.argv[1],"rb").read())
for pl in xs.planes:
    if pl.name != "/device:TPU:0": continue
    evmeta = pl.event_metadata
    for l in pl.lines:
        if l.name not in ("XLA Modules",): continue
        evs = sorted(l.events, key=lambda e: e.offset_ps)
        t0 = evs[0].offset_ps
        prev_end = None
        for e in evs:
            m = evmeta[e.metadata_id]
            start = (e.offset_ps - t0)/1e9
            dur = e.duration_ps/1e9
            gap = "" if prev_end is None else f" gap={start-prev_end:7.2f}"
            print(f"{start:9.2f} ms  dur={dur:7.2f}{gap}  {m.name[:60]}")
            prev_end = start + dur
