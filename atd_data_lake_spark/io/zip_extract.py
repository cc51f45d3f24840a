"""S5 — GRIDSMART ZIP archive pre-extraction (gs_investigate.py:16-92,
util/zip_helper.py:12-80).

A day ZIP holds one directory per camera MAC (``..-..-..-..-..-..``);
inside, either layout A (a ``YYYY-MM-DD`` date directory of per-zone
``<GUID>.csv`` files) or layout B (a nested ``YYYY-MM-DD.zip``).  zipfile
is not a Spark source, so extraction is a pre-processing step that lands
per-zone CSVs for the S6 scan; the reference's first-match-only TODO
("only finds the first camera directory") is fixed — every MAC dir is
extracted.

Scale note: one day-zip per device per day (≈100 devices → trivially
driver-feasible).  For bulk backfills run it distributed:
``binaryFile``-scan the zips and call ``extract_zip_bytes`` inside
``mapInPandas`` so each executor extracts its own shard (the zip bytes
are the row payload — nothing funnels through the driver).
"""

from __future__ import annotations

import io
import os
import re
import zipfile
from dataclasses import dataclass

MAC_PATTERN = re.compile(r"^..\-..\-..\-..\-..\-..$")
DATE_PATTERN = re.compile(r"^\d{4}-\d{2}-\d{2}$")


@dataclass(frozen=True)
class ZoneFile:
    mac: str
    date: str  # YYYY-MM-DD
    guid: str  # zone GUID (undashed, as named in the archive)
    data: bytes  # per-zone CSV payload


def _first_component(name: str) -> str:
    return name.split("/", 1)[0]


def extract_zip_bytes(payload: bytes) -> list[ZoneFile]:
    """Crack a day ZIP (as bytes) into per-zone CSV payloads, handling
    layout A (date dir) and layout B (nested zip) for EVERY MAC dir."""
    out: list[ZoneFile] = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        names = zf.namelist()
        macs = sorted(
            {
                _first_component(n)
                for n in names
                if MAC_PATTERN.match(_first_component(n))
            }
        )
        for mac in macs:
            inner = [n for n in names if n.startswith(mac + "/") and len(n) > len(mac) + 1]
            # layout A: MAC/<date>/<GUID>.csv
            handled = False
            for n in inner:
                parts = n.split("/")
                if (
                    len(parts) == 3
                    and DATE_PATTERN.match(parts[1])
                    and parts[2].lower().endswith(".csv")
                ):
                    out.append(
                        ZoneFile(mac, parts[1], parts[2][:-4], zf.read(n))
                    )
                    handled = True
            if handled:
                continue
            # layout B: MAC/<date>.zip of <GUID>.csv files
            for n in inner:
                base = os.path.basename(n)
                if base.lower().endswith(".zip") and DATE_PATTERN.match(base[:-4]):
                    with zipfile.ZipFile(io.BytesIO(zf.read(n))) as inner_zf:
                        for m in inner_zf.namelist():
                            if m.lower().endswith(".csv"):
                                out.append(
                                    ZoneFile(
                                        mac,
                                        base[:-4],
                                        os.path.basename(m)[:-4],
                                        inner_zf.read(m),
                                    )
                                )
    return out


def extract_to_dir(zip_path: str, dest_dir: str) -> list[str]:
    """Extract a day ZIP to ``dest_dir/<mac>/<date>/<guid>.csv`` files and
    return their paths — the landing layout for the S6 per-zone scan
    (schema dispatch by count_version, gs_json_standard.py:125-131)."""
    with open(zip_path, "rb") as f:
        zones = extract_zip_bytes(f.read())
    paths = []
    for z in zones:
        d = os.path.join(dest_dir, z.mac, z.date)
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, z.guid + ".csv")
        with open(p, "wb") as out:
            out.write(z.data)
        paths.append(p)
    return paths
