"""Extract the Draco-compressed primitive corpus from the reference's
demo assets (read-only at /root/reference/example/public/gltf).

Used by the Draco decoder's development/validation harness and by
tests/test_draco.py: every stream comes with its glTF-declared ground
truth (attribute point counts, index count, position bounds) so the
from-scratch decoder can be checked without the upstream draco library.
"""

from __future__ import annotations

import glob
import json
import os
import struct

GLTF_DIR = "/root/reference/example/public/gltf"


def glb_draco_streams(path: str):
    """Yield dicts {data, attributes, counts, index_count, pos_min, pos_max}
    for every KHR_draco_mesh_compression primitive in a .glb file."""
    with open(path, "rb") as f:
        data = f.read()
    clen, _ = struct.unpack_from("<II", data, 12)
    gltf = json.loads(data[20:20 + clen])
    off = 20 + clen
    bin_off = None
    while off < len(data):
        length, ctype = struct.unpack_from("<II", data, off)
        if ctype == 0x004E4942:
            bin_off = off + 8
        off += 8 + length
    out = []
    for mesh in gltf.get("meshes", []):
        for prim in mesh.get("primitives", []):
            ext = prim.get("extensions", {}).get("KHR_draco_mesh_compression")
            if ext is None:
                continue
            view = gltf["bufferViews"][ext["bufferView"]]
            start = bin_off + view.get("byteOffset", 0)
            acc = gltf["accessors"]
            pos_acc = acc[prim["attributes"]["POSITION"]]
            out.append({
                "data": data[start:start + view["byteLength"]],
                "attributes": ext["attributes"],  # name -> draco unique id
                "counts": {k: acc[a]["count"]
                           for k, a in prim["attributes"].items()},
                "index_count": acc[prim["indices"]]["count"],
                "pos_min": pos_acc.get("min"),
                "pos_max": pos_acc.get("max"),
                "accessor_types": {
                    k: (acc[a]["type"], acc[a]["componentType"],
                        acc[a].get("normalized", False))
                    for k, a in prim["attributes"].items()},
            })
    return out


def corpus(limit_per_file=None):
    """All Draco streams in the reference assets, smallest files first."""
    files = sorted(glob.glob(os.path.join(GLTF_DIR, "*.optimized.glb")),
                   key=os.path.getsize)
    for path in files:
        streams = glb_draco_streams(path)
        if limit_per_file is not None:
            streams = streams[:limit_per_file]
        for i, s in enumerate(streams):
            s["name"] = f"{os.path.basename(path)}[{i}]"
            yield s


if __name__ == "__main__":
    n = 0
    for s in corpus():
        n += 1
    print(f"{n} draco streams")
