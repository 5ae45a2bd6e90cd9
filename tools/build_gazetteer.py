"""Build the offline GeoNames gazetteer artifact.

Reads a GeoNames-derived cities TSV (the ``cities15000`` subset: every city
over 15,000 inhabitants, ~34k places; columns ``name``, ``asciiname`` (empty
when identical), ``lat``, ``lon``, ``country_code``, ``population``) and
writes ``shodh_tpu/nlp/data/geonames_cities.tsv.gz`` in the loader's schema:

    form <TAB> canonical <TAB> lat <TAB> lon <TAB> country <TAB> population

one row per distinct lowercased name form per place (both ``name`` and
``asciiname`` become forms, so "Zürich" and "Zurich" resolve identically),
rows sorted (form, -population, canonical) so the artifact is byte-stable
across regenerations regardless of input ordering.

Data provenance: GeoNames (https://www.geonames.org), licensed CC BY 4.0 —
the header comment in the artifact carries the required attribution. This is
public factual data (city names, coordinates, populations), the same dataset
the reference embeds (src/gazetteer/mod.rs:34-40 documents cities15000 +
CC BY 4.0 attribution); only the reduced schema here is ours.

Usage:
    python tools/build_gazetteer.py [input_tsv] [output_gz]
"""

from __future__ import annotations

import gzip
import sys
from pathlib import Path

DEFAULT_INPUT = Path("/root/reference/src/gazetteer/cities15000.tsv")
DEFAULT_OUTPUT = (
    Path(__file__).resolve().parent.parent
    / "shodh_tpu"
    / "nlp"
    / "data"
    / "geonames_cities.tsv.gz"
)

HEADER = (
    "# GeoNames cities15000 subset — reduced to form/canonical/lat/lon/"
    "country/population.\n"
    "# Data (c) GeoNames (https://www.geonames.org), CC BY 4.0. "
    "Regenerate: python tools/build_gazetteer.py\n"
)


def build(input_tsv: Path, output_gz: Path) -> int:
    rows: set[tuple[str, str, str, str, str, int]] = set()
    for line in input_tsv.read_text(encoding="utf-8", errors="replace").splitlines():
        if not line or line.startswith("#"):
            continue
        cols = line.split("\t")
        if len(cols) < 6:
            continue
        name, asciiname, lat, lon, country, pop = cols[:6]
        try:
            float(lat), float(lon)
            population = int(float(pop))
        except ValueError:
            continue
        canonical = name.strip()
        if not canonical:
            continue
        for form in {name.strip().lower(), asciiname.strip().lower()}:
            if form:
                rows.add((form, canonical, lat, lon, country, population))
    ordered = sorted(rows, key=lambda r: (r[0], -r[5], r[1]))
    body = HEADER + "".join(
        f"{f}\t{c}\t{lat}\t{lon}\t{cc}\t{pop}\n" for f, c, lat, lon, cc, pop in ordered
    )
    # mtime=0 + empty FNAME → byte-reproducible gzip regardless of build
    # time and output path
    with open(output_gz, "wb") as fh:
        with gzip.GzipFile(filename="", fileobj=fh, mode="wb", mtime=0) as gz:
            gz.write(body.encode("utf-8"))
    return len(ordered)


def main() -> None:
    input_tsv = Path(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_INPUT
    output_gz = Path(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_OUTPUT
    if not input_tsv.exists():
        raise SystemExit(f"input TSV not found: {input_tsv}")
    n = build(input_tsv, output_gz)
    print(f"wrote {n} rows -> {output_gz}")


if __name__ == "__main__":
    main()
