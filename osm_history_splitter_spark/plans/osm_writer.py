"""Reference-format extract sinks: ``.osm`` / ``.osh`` × raw / ``.gz`` /
``.bz2`` XML and ``.pbf`` binary, selected PER EXTRACT by output-file
extension exactly like the reference (``cut.hpp:73-74`` hands each dest
filename to Osmium's output factory; the format list is ``README.md:80``
and the reference's own ``example.config`` mixes ``.osh`` / ``.osh.pbf``
/ ``.osh.gz`` / ``.osh.bz2`` in one run). Extracts are grouped by
(history, codec) and each group runs as one distributed serialization
job — PBF groups via ``plans/pbf_writer.py`` over the from-scratch wire
codec in ``sources/pbf.py``.

Spark-first design — the serialization is distributed, the tail is a
stream-concat:

1. every element row is rendered to its XML string by PURE CATALYST
   expressions (concat / regexp-escape / transform over tags, refs,
   members) — whole-stage codegen, no Python in the row path;
2. the frame is ``repartitionByRange(extract, type_rank, id, version)``
   + ``sortWithinPartitions`` and written with the text sink,
   ``partitionBy(extract)``: part-file NAMES carry the task index, so
   the lexicographic file order inside each extract dir IS the global
   element order (O1/O2 — nodes, then ways, then relations, each by
   id, version — the reference's pass order);
3. the driver streams header + fragments + footer into the final file.
   For ``.gz``/``.bz2`` the fragments are written ALREADY COMPRESSED by
   the executors (text-sink codec) and concatenated as raw bytes —
   multi-member gzip / multi-stream bz2 are valid files, so the driver
   never recompresses; its cost is byte copying only. A single XML file
   is inherently one stream — the same tail the single-threaded
   reference pays for its entire run, here paid only at the very end.

Timestamps are rendered in the Spark session time zone with a ``Z``
suffix, matching the fixture loader's naive parse (``sources/osm_xml._ts``).
The sink REQUIRES a UTC session (``session.get_spark`` pins it;
``write_extracts_osm`` verifies and raises otherwise) — a non-UTC session
would shift every rendered time while still labeling it ``Z``.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["write_extracts_osm", "parse_format", "element_xml_exprs"]

_GENERATOR = "osm-history-splitter-spark"

#: entity emit order within a file (reference pass order, SURVEY O1)
_TYPE_RANK = {"node": 0, "way": 1, "relation": 2}


def parse_format(filename: str) -> tuple[bool, str | None]:
    """``(history, codec)`` from the output extension — the reference's
    format-by-extension rule. Codec is ``None`` (plain XML), ``gzip`` /
    ``bzip2`` (compressed XML), or ``pbf`` (binary container,
    ``plans/pbf_writer.py`` over the from-scratch codec in
    ``sources/pbf.py``)."""
    name = filename.lower()
    compression = None
    if name.endswith(".gz"):
        compression, name = "gzip", name[: -len(".gz")]
    elif name.endswith(".bz2"):
        compression, name = "bzip2", name[: -len(".bz2")]
    if name.endswith(".pbf"):
        if compression:
            raise ValueError(f"PBF is already compressed: {filename!r}")
        compression, name = "pbf", name[: -len(".pbf")]
    if name.endswith(".osh"):
        return True, compression
    if name.endswith(".osm"):
        return False, compression
    raise ValueError(f"unknown OSM output extension: {filename!r}")


def _esc(col: Column) -> Column:
    """XML attribute-value escape (amp first; newlines/tabs as charrefs so
    multi-line tag values survive the line-oriented text sink). Literal
    ``replace``, NOT ``regexp_replace`` — the regex engine costs ~3× on
    the serialization hot path for fixed single-char patterns."""
    c = col
    for old, new in (
        ("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"),
        ("\n", "&#10;"), ("\r", "&#13;"), ("\t", "&#9;"),
    ):
        c = F.replace(c, F.lit(old), F.lit(new))
    return c


def _attr(name: str, col: Column, escape: bool = False) -> Column:
    """`` name="value"`` or empty when the value is null (uid/user/
    changeset are optional in OSM XML). ``escape`` only for columns that
    can carry XML metacharacters (user names, tag text, roles) — the
    numeric/timestamp attributes skip the whole replace chain."""
    v = col.cast("string")
    if escape:
        v = _esc(v)
    return F.coalesce(
        F.concat(F.lit(f' {name}="'), v, F.lit('"')),
        F.lit(""),
    )


def _common_attrs(history: bool) -> Column:
    """id/version[/visible]/timestamp/uid/user/changeset — attribute set
    and order shared by all three element kinds. ``visible`` is a
    history-format attribute (.osh); .osm files are single-version by
    the S10 compat rule and omit it."""
    parts = [
        _attr("id", F.col("id")),
        _attr("version", F.col("version")),
    ]
    if history:
        # NULL visible means "not deleted" (the loaders' default too)
        parts.append(
            _attr(
                "visible",
                F.when(
                    F.coalesce(F.col("visible"), F.lit(True)), "true"
                ).otherwise("false"),
            )
        )
    parts += [
        _attr(
            "timestamp",
            F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z")),
        ),
        _attr("uid", F.col("uid")),
        _attr("user", F.col("user"), escape=True),
        _attr("changeset", F.col("changeset")),
    ]
    return F.concat(*parts)


def _tag_lines() -> Column:
    """Child ``<tag k v/>`` lines from the tags map (sorted by key for
    deterministic output), as one string with leading newlines."""
    entries = F.array_sort(F.map_entries(F.col("tags")))
    line = lambda e: F.concat(  # noqa: E731
        F.lit('\n\t\t<tag k="'),
        _esc(e.getField("key")),
        F.lit('" v="'),
        _esc(e.getField("value")),
        F.lit('"/>'),
    )
    # null/missing tags → no child lines (coalesce, not typed empty map)
    return F.coalesce(F.concat_ws("", F.transform(entries, line)), F.lit(""))


def _wrap(open_tag: Column, children: Column, name: str) -> Column:
    """Self-close when there are no children, else open/children/close."""
    return F.when(
        children == "",
        F.concat(open_tag, F.lit("/>")),
    ).otherwise(
        F.concat(open_tag, F.lit(">"), children, F.lit(f"\n\t</{name}>"))
    )


def element_xml_exprs(history: bool) -> dict[str, Column]:
    """One Catalyst Column per entity kind rendering a row to its XML
    element (tab-indented like the reference's osmium XML output)."""
    # nodes: deleted versions carry no lat/lon (OSM history convention).
    # Fixed 7-decimal rendering (the reference/osmium convention, and the
    # PBF path's 100-nanodegree granularity): a bare double→string cast
    # would emit scientific notation for |v| < 1e-3 ("5.0E-4"), which
    # strict coordinate parsers reject.
    pos = F.when(
        F.col("lat").isNotNull() & F.col("lon").isNotNull(),
        F.concat(
            _attr("lat", F.format_string("%.7f", F.col("lat"))),
            _attr("lon", F.format_string("%.7f", F.col("lon"))),
        ),
    ).otherwise(F.lit(""))
    node_open = F.concat(F.lit("\t<node"), _common_attrs(history), pos)
    node = _wrap(node_open, _tag_lines(), "node")

    nd = lambda r: F.concat(  # noqa: E731
        F.lit('\n\t\t<nd ref="'), r.cast("string"), F.lit('"/>')
    )
    way_children = F.concat(
        F.coalesce(F.concat_ws("", F.transform(F.col("refs"), nd)), F.lit("")),
        _tag_lines(),
    )
    way = _wrap(F.concat(F.lit("\t<way"), _common_attrs(history)), way_children, "way")

    mtype = lambda m: (  # noqa: E731
        F.when(m.getField("type") == "n", "node")
        .when(m.getField("type") == "w", "way")
        .otherwise("relation")
    )
    member = lambda m: F.concat(  # noqa: E731
        F.lit('\n\t\t<member type="'),
        mtype(m),
        F.lit('" ref="'),
        m.getField("ref").cast("string"),
        F.lit('" role="'),
        _esc(F.coalesce(m.getField("role"), F.lit(""))),
        F.lit('"/>'),
    )
    rel_children = F.concat(
        F.coalesce(
            F.concat_ws("", F.transform(F.col("members"), member)), F.lit("")
        ),
        _tag_lines(),
    )
    relation = _wrap(
        F.concat(F.lit("\t<relation"), _common_attrs(history)),
        rel_children,
        "relation",
    )
    return {"node": node, "way": way, "relation": relation}


def _header(bounds: tuple | None) -> str:
    h = (
        "<?xml version='1.0' encoding='UTF-8'?>\n"
        f'<osm version="0.6" generator="{_GENERATOR}">'
    )
    if bounds is not None:
        minlon, minlat, maxlon, maxlat = bounds
        h += (
            f'\n\t<bounds minlon="{minlon}" minlat="{minlat}"'
            f' maxlon="{maxlon}" maxlat="{maxlat}"/>'
        )
    return h


def _compress_bytes(data: bytes, compression: str | None) -> bytes:
    if compression == "gzip":
        import gzip

        return gzip.compress(data)
    if compression == "bzip2":
        import bz2

        return bz2.compress(data)
    return data


def _concat_fragments(
    frag_dir: Path, out_file: Path, header: str, compression: str | None
) -> None:
    """Stream header + ordered part files + footer into the final file.
    Compressed fragments are concatenated as raw bytes (multi-member
    gzip / multi-stream bz2) — no recompression, bounded driver memory."""
    suffix = {"gzip": ".gz", "bzip2": ".bz2"}.get(compression, "")
    # NUMERIC part-index order: Spark pads task indices to 5 digits, so a
    # >99,999-partition job writes part-100000-… which sorts
    # lexicographically before part-99999-… and would splice the global
    # element order out of sequence
    import re

    def _part_key(p: Path):
        m = re.match(r"part-(\d+)", p.name)
        return (int(m.group(1)) if m else -1, p.name)

    parts = sorted(frag_dir.glob(f"part-*{suffix}"), key=_part_key)
    out_file.parent.mkdir(parents=True, exist_ok=True)
    with open(out_file, "wb") as out:
        out.write(_compress_bytes((header + "\n").encode(), compression))
        for p in parts:
            with open(p, "rb") as f:
                while chunk := f.read(1 << 20):
                    out.write(chunk)
        out.write(_compress_bytes(b"</osm>\n", compression))


def write_extracts_osm(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    catalog,
    out_dir: str,
    filenames: dict[str, str] | None = None,
    partitions: int | None = None,
) -> dict[str, str]:
    """Emit each extract as ONE reference-format OSM XML file.

    Inputs are split results: entity frames carrying an ``extract``
    column (``hardcut``/``softcut`` output). ``filenames`` maps extract
    name → output file name (extension selects format, reference
    ``cut.hpp:73-74``); default ``<name>.osh``. Returns
    ``{extract: absolute file path}``.

    One Spark job serializes each (history, codec) format GROUP of
    extracts across all entity kinds: union the three frames with a type
    rank, range-partition by (extract, rank, id, version), sort within
    partitions, text-write partitioned by extract — then a driver-side
    stream-concat per extract (see module docstring for why this is the
    scalable shape). A single-format catalog (the common case) is one
    job over the unfiltered frames; mixed catalogs (the reference's
    ``example.config``) add one filtered pass per extra format."""
    from .catalog import ExtractCatalog

    # Both serializers treat timestamps as UTC: the XML path renders the
    # session-local timestamp with a literal "Z", and the PBF encoders
    # stamp epoch millis assuming naive==UTC. A non-UTC session would
    # emit shifted times LABELED as UTC — refuse instead of corrupting.
    tz = nodes.sparkSession.conf.get("spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            f"OSM sinks require spark.sql.session.timeZone=UTC (got {tz!r});"
            " session.get_spark pins it — set it on custom sessions"
        )

    # per-entry defaulting: a partial dict covers the extracts it names,
    # the rest get the documented "<name>.osh" default (was: KeyError)
    filenames = {
        **{e.name: f"{e.name}.osh" for e in catalog},
        **(filenames or {}),
    }
    fmts = {name: parse_format(fn) for name, fn in filenames.items()}
    groups: dict[tuple, list] = {}
    for e in catalog:
        groups.setdefault(fmts[e.name], []).append(e)

    out_paths: dict[str, str] = {}
    multi = len(groups) > 1
    for (history, compression), extracts in sorted(
        groups.items(), key=lambda kv: (kv[0][0], kv[0][1] or "")
    ):
        sub = ExtractCatalog(extracts) if multi else catalog
        names = [e.name for e in extracts]
        if multi:
            gn, gw, gr = (
                df.filter(F.col("extract").isin(names))
                for df in (nodes, ways, relations)
            )
        else:
            gn, gw, gr = nodes, ways, relations
        if compression == "pbf":
            from .pbf_writer import write_extracts_pbf

            out_paths.update(
                write_extracts_pbf(
                    gn, gw, gr, sub, out_dir,
                    filenames={n: filenames[n] for n in names},
                    partitions=partitions, history=history,
                )
            )
        else:
            out_paths.update(
                _write_xml_group(
                    gn, gw, gr, sub, out_dir,
                    {n: filenames[n] for n in names},
                    partitions, history, compression,
                )
            )
    return out_paths


def _write_xml_group(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    catalog,
    out_dir: str,
    filenames: dict[str, str],
    partitions: int | None,
    history: bool,
    compression: str | None,
) -> dict[str, str]:
    """One distributed XML serialization job for extracts sharing
    (history, codec) — the per-group body of :func:`write_extracts_osm`."""
    spark = nodes.sparkSession
    exprs = element_xml_exprs(history)
    pieces = []
    for kind, df in (("node", nodes), ("way", ways), ("relation", relations)):
        pieces.append(
            df.select(
                F.col("extract"),
                F.lit(_TYPE_RANK[kind]).alias("type_rank"),
                F.col("id"),
                F.col("version"),
                exprs[kind].alias("value"),
            )
        )
    allrows = pieces[0].unionByName(pieces[1]).unionByName(pieces[2])

    n = partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # codec-unique fragment dir: a mixed-format run writes several groups
    # under one out_dir and each overwrite-mode text write must not
    # clobber a sibling group's fragments
    frag_root = (
        Path(out_dir)
        / f"_xml_fragments_{'osh' if history else 'osm'}_{compression or 'raw'}"
    )
    writer = (
        allrows.repartitionByRange(n, "extract", "type_rank", "id", "version")
        .sortWithinPartitions("extract", "type_rank", "id", "version")
        .select("extract", "value")
        .write.mode("overwrite")
        .partitionBy("extract")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.text(str(frag_root))

    out_paths: dict[str, str] = {}
    # partition dir values are Hive/URL-escaped on disk (an extract named
    # europe/germany lands under extract=europe%2Fgermany) — resolve by
    # UNQUOTING the written dirs, never by formatting the raw name (the
    # same convention plans/io.py uses for its lineage listing)
    from urllib.parse import unquote

    frag_dirs = {
        unquote(d.name.split("=", 1)[1]): d
        for d in frag_root.glob("extract=*")
        if d.is_dir()
    }
    for e in catalog:
        # an extract with zero rows wrote no partition dir: the fallback
        # path does not exist and _concat_fragments emits header+footer
        frag_dir = frag_dirs.get(e.name, frag_root / f"extract={e.name}")
        out_file = Path(out_dir) / filenames[e.name]
        bounds = (e.minlon, e.minlat, e.maxlon, e.maxlat)
        _concat_fragments(frag_dir, out_file, _header(bounds), compression)
        out_paths[e.name] = str(out_file)
    # fragments are an implementation detail of the sink, not output
    import shutil

    shutil.rmtree(frag_root, ignore_errors=True)
    return out_paths
