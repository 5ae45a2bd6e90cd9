"""Offline toponym gazetteer: place name -> coordinates.

Reference: ``src/gazetteer/mod.rs`` — GeoNames-derived toponym resolution
with population-weighted homonym disambiguation, filling
``Experience.toponyms`` (deliberately NOT the geo index — textual place
mentions are weaker evidence than GPS).

Data: loads a GeoNames-format TSV when provided (``load_tsv``: name, lat,
lon, population columns); ships with a small built-in list of major world
cities so the subsystem works offline out of the box.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

# name -> (lat, lon, population). Built-in seed: major cities (public data).
_BUILTIN: dict[str, tuple[float, float, int]] = {
    "new york": (40.7128, -74.0060, 8_400_000),
    "london": (51.5074, -0.1278, 8_900_000),
    "paris": (48.8566, 2.3522, 2_100_000),
    "berlin": (52.5200, 13.4050, 3_700_000),
    "tokyo": (35.6762, 139.6503, 13_900_000),
    "san francisco": (37.7749, -122.4194, 880_000),
    "seattle": (47.6062, -122.3321, 740_000),
    "austin": (30.2672, -97.7431, 960_000),
    "boston": (42.3601, -71.0589, 690_000),
    "chicago": (41.8781, -87.6298, 2_700_000),
    "los angeles": (34.0522, -118.2437, 3_900_000),
    "toronto": (43.6532, -79.3832, 2_900_000),
    "sydney": (-33.8688, 151.2093, 5_300_000),
    "singapore": (1.3521, 103.8198, 5_600_000),
    "bangalore": (12.9716, 77.5946, 8_400_000),
    "mumbai": (19.0760, 72.8777, 12_400_000),
    "delhi": (28.7041, 77.1025, 11_000_000),
    "beijing": (39.9042, 116.4074, 21_500_000),
    "shanghai": (31.2304, 121.4737, 24_200_000),
    "dubai": (25.2048, 55.2708, 3_300_000),
    "amsterdam": (52.3676, 4.9041, 870_000),
    "zurich": (47.3769, 8.5417, 430_000),
    "dublin": (53.3498, -6.2603, 550_000),
    "madrid": (40.4168, -3.7038, 3_200_000),
    "rome": (41.9028, 12.4964, 2_800_000),
    "moscow": (55.7558, 37.6173, 12_500_000),
    "seoul": (37.5665, 126.9780, 9_700_000),
    "sao paulo": (-23.5505, -46.6333, 12_300_000),
    "mexico city": (19.4326, -99.1332, 9_200_000),
    "cairo": (30.0444, 31.2357, 9_500_000),
    "lagos": (6.5244, 3.3792, 14_800_000),
    "nairobi": (-1.2921, 36.8219, 4_400_000),
}


@dataclass
class Toponym:
    name: str
    lat: float
    lon: float
    population: int


class Gazetteer:
    def __init__(self, tsv_path: Optional[str | Path] = None):
        # name -> list of candidates (homonyms)
        self._places: dict[str, list[Toponym]] = {}
        for name, (lat, lon, pop) in _BUILTIN.items():
            self._places[name] = [Toponym(name, lat, lon, pop)]
        if tsv_path is not None:
            self.load_tsv(tsv_path)

    def load_tsv(self, path: str | Path) -> int:
        """GeoNames cities TSV: columns name, lat, lon, population (tab)."""
        n = 0
        for line in Path(path).read_text(encoding="utf-8", errors="replace").splitlines():
            parts = line.split("\t")
            if len(parts) < 4:
                continue
            try:
                top = Toponym(parts[0].lower(), float(parts[1]), float(parts[2]), int(float(parts[3])))
            except ValueError:
                continue
            self._places.setdefault(top.name, []).append(top)
            n += 1
        return n

    def resolve(self, name: str) -> Optional[Toponym]:
        """Population-weighted homonym resolution: biggest place wins."""
        candidates = self._places.get(name.strip().lower())
        if not candidates:
            return None
        return max(candidates, key=lambda t: t.population)

    def extract_toponyms(self, text: str) -> list[Toponym]:
        """Longest-match scan for known places in the text."""
        lowered = " " + re.sub(r"[^a-z0-9 ]", " ", text.lower()) + " "
        found: dict[str, Toponym] = {}
        for name in self._places:
            if f" {name} " in lowered:
                top = self.resolve(name)
                if top is not None:
                    found[name] = top
        # drop places contained in longer matches ("york" in "new york")
        names = sorted(found, key=len, reverse=True)
        out: list[Toponym] = []
        taken: list[str] = []
        for n in names:
            if any(n in t for t in taken):
                continue
            taken.append(n)
            out.append(found[n])
        return out
