"""Deterministic synthetic corpus generator (pure function of seed+size).

Materializes the two pipeline inputs described by the target spec:

- ``documents_spans(doc_id, spans: array<struct<kind,text,media_ref,offset>>)``
  — interleaved text+media documents; offsets strictly increasing with
  occasional gaps; ~30% media spans; a 2% "media-heavy" skew cohort with
  50..200 spans per doc at ~90% media probability (≈45..180 media spans
  in expectation — exercises the salting path);
- ``media_store(media_ref, content, fmt, width, height, truth_lines)`` —
  fake media payloads that the FakeRecognizer decodes back to their embedded
  ground-truth line lists.  ``truth_lines`` is a test-only convenience
  column; the pipeline never reads it.

~30% of media carry INE-credential line sequences (generated to exercise
every branch of the extraction cascade: C/D/GH classification, the three
name strategies, the three vigencia strategies, CURP/elector-key parsing and
completions); the rest are generic text lines.

Everything derives from ``random.Random(f"{seed}/{doc_id}")`` so any doc is
reproducible in isolation (resume tests re-generate single docs).
"""

from __future__ import annotations

import json
from random import Random

from ocr_spark.extraction.name_split import curp_prefix4
from ocr_spark.recognizer import FAKE_MAGIC

_SURNAMES = [
    "CASTILLO", "OLIVERA", "GOMEZ", "HERNANDEZ", "DE LA CRUZ", "MARTINEZ",
    "LOPEZ", "GARCIA", "PEREZ", "SANCHEZ", "RAMIREZ", "TORRES", "FLORES",
    "VAN DYKE", "MC GREGOR", "DEL VALLE",
]
_GIVEN = [
    "RICARDO ORLANDO", "MARIA FERNANDA", "JOSE LUIS", "ANA", "JUAN CARLOS",
    "LUISA", "PEDRO", "MARIA", "JOSE", "GUADALUPE ITZEL",
]
_STREETS = ["C LOS MOLINOS 174", "AV JUAREZ 10 INT. 2", "CALLE 5 DE MAYO 1203",
            "PRIV DEL SOL 8B", "AND TULUM 55"]
_COLONIAS = ["FRACC LA HERRADURA III 77050", "COL CENTRO 06000",
             "U HAB SOLIDARIDAD", "COL OBRERA 44100"]
_CITIES = ["OTHON P. BLANCO, Q. ROO.", "GUADALAJARA, JAL.", "BENITO JUAREZ",
           "MONTERREY, N.L.", "QRO"]
_CURP_STATES = ["QR", "DF", "JC", "NL", "MC", "GT", "VZ", "YN", "ZZ"]
_ELECTOR_STATES = ["23", "09", "14", "19", "15", "11", "30", "31", "77"]
_WORDS = (
    "lorem ipsum factura recibo acta constancia folio numero expediente "
    "tramite oficina ventanilla modulo registro copia original sello firma "
    "fecha hora pagina seccion parrafo clausula anexo referencia"
).split()
_HTML_SENTENCES = [
    "The quarterly report shows steady growth across all regions.",
    "Researchers announced a new method for typesetting ancient scripts.",
    "El ayuntamiento publicó la convocatoria anual de becas municipales.",
    "Long-form journalism requires careful sourcing and patient editing.",
    "La biblioteca amplió su horario durante el periodo de exámenes.",
]


def _curp_for(rng: Random, paternal: str, maternal: str, given: str) -> str:
    prefix = curp_prefix4(paternal, maternal, given)
    if len(prefix) < 4:
        prefix = (prefix + "XXXX")[:4]
    yy = rng.randint(0, 99)
    mm = rng.randint(1, 12)
    dd = rng.randint(1, 28)
    sex = rng.choice("HMX")
    state = rng.choice(_CURP_STATES)
    cons = "".join(rng.choice("BCDFGHJKLMNPQRSTVWXYZ") for _ in range(3))
    return f"{prefix}{yy:02d}{mm:02d}{dd:02d}{sex}{state}{cons}{rng.randint(0, 99):02d}"


def _elector_key(rng: Random) -> str:
    """18-char elector key, two layouts: letters-leading (the state code
    at positions 10-11 is INVISIBLE to parse_elector_key, which reads
    key[0:2] per the reference — every such key parses to empty
    estado_clave, the miss path), and state-code-LEADING (key[0:2] is a
    real 2-digit code, exercising the ELECTOR_STATE_CODES hit path and
    the estado completion at fields.py).  Both are exactly 18 chars by
    construction — no truncate/pad."""
    letters = "".join(rng.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZ") for _ in range(6))
    state = rng.choice(_ELECTOR_STATES)
    year = rng.randint(1988, 2027)
    rest = f"{rng.randint(0, 9999):04d}"
    tail = f"H{rng.randint(0, 9):01d}"
    if rng.random() < 0.5:
        return f"{state}{letters}{year}{rest}{tail}"  # 2+6+4+4+2 = 18
    return f"{letters}{year}{state}{rest}{tail}"      # 6+4+2+4+2 = 18


def gen_ine_lines(rng: Random) -> list[str]:
    """One synthetic INE/IFE card as an ordered OCR line list."""
    card_kind = rng.choice(["C", "D", "GH", "GH", "D"])
    paternal = rng.choice(_SURNAMES)
    maternal = rng.choice(_SURNAMES)
    given = rng.choice(_GIVEN)
    name_lines = [paternal, maternal, given]
    curp = _curp_for(rng, paternal, maternal, given)
    clave = _elector_key(rng)
    y1 = rng.randint(2015, 2024)
    y2 = y1 + rng.choice([9, 10])

    lines: list[str] = []
    if card_kind == "C":
        lines += ["INSTITUTO FEDERAL ELECTORAL", "REGISTRO FEDERAL DE ELECTORES",
                  "CREDENCIAL PARA VOTAR"]
    else:
        lines += ["INSTITUTO NACIONAL ELECTORAL", "CREDENCIAL PARA VOTAR"]
        if rng.random() < 0.2:
            lines.append("MEXICO")

    name_style = rng.random()
    if name_style < 0.6:
        # bare-label layout (exercises name strategy (b) on GH cards)
        lines.append("NOMBRE")
        lines += name_lines
    elif name_style < 0.75:
        # inline-labeled single line (exercises the 'NOMBRE: <name>'
        # regex branch of strategy (b) — previously never generated,
        # so a regression there was invisible to the golden and
        # native-differential tests)
        lines.append(f"NOMBRE: {paternal} {maternal} {given}")
    else:
        lines += name_lines

    has_domicilio = rng.random() < 0.85
    if has_domicilio:
        lines.append("DOMICILIO")
        lines.append(rng.choice(_STREETS))
        lines.append(rng.choice(_COLONIAS))
        lines.append(rng.choice(_CITIES))

    # 'D' means INE WITHOUT an elector key (classify rule 3): emitting
    # CLAVE DE ELECTOR on every card made all non-C fixtures classify
    # 'GH', so the 'D' branch of the cascade (and its native twin) was
    # never generated by this corpus.
    if card_kind != "D":
        lines.append(f"CLAVE DE ELECTOR {clave}")
    lines.append(f"CURP {curp}")
    if rng.random() < 0.8:
        lines.append(f"FECHA DE NACIMIENTO {rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}/{rng.randint(1940, 2010)}")
    if rng.random() < 0.7:
        lines.append(f"AÑO DE REGISTRO {rng.randint(1992, 2024)} {rng.randint(0, 9):02d}")
    if rng.random() < 0.7:
        lines.append("SECCION")
        lines.append(f"{rng.randint(1, 9999):04d}")
    vig_style = rng.random()
    if vig_style < 0.4:
        lines.append(f"VIGENCIA {y1}-{y2}")
    elif vig_style < 0.6:
        lines.append("VIGENCIA")
        lines.append(f"{y1} {y2}")
    elif vig_style < 0.8:
        lines.append("VIGENCIA")
        lines.append(str(y1))
        lines.append(str(y2))
    else:
        lines.append(f"{y1}-{y2}")
    if rng.random() < 0.3:
        lines.append(f"SEXO {rng.choice('HM')}")
    if rng.random() < 0.2:
        # stray whitespace / noise the normalizer must handle
        lines.insert(rng.randrange(len(lines)), "   ")
        lines.append("EMISION  2021")
    if rng.random() < 0.15:
        # duplicate a line to exercise the .index() first-occurrence quirk
        lines.append(lines[rng.randrange(len(lines))])
    return lines


def gen_generic_lines(rng: Random) -> list[str]:
    n = rng.randint(1, 8)
    return [
        " ".join(rng.choice(_WORDS) for _ in range(rng.randint(2, 8)))
        for _ in range(n)
    ]


def gen_plain_text(rng: Random) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(5, 40)))


def gen_html_text(rng: Random) -> str:
    """HTML with known-boilerplate blocks (nav/footer/tag-dense lists) around
    high-ratio content paragraphs."""
    content = [rng.choice(_HTML_SENTENCES) for _ in range(rng.randint(1, 4))]
    nav_items = "".join(f'<li><a href="/{w}">{w}</a></li>'
                        for w in rng.sample(_WORDS, 4))
    parts = [
        "<html><head><title>t</title><style>body{color:red}</style>",
        "<script>var x=1;</script></head><body>",
        f"<nav><ul>{nav_items}</ul></nav>",
        f"<header><h1>{rng.choice(_WORDS)}</h1></header>",
    ]
    for sent in content:
        parts.append(f"<p>{sent}</p>")
    if rng.random() < 0.5:
        links = "".join(f'<a href="#">{w}</a> ' for w in rng.sample(_WORDS, 5))
        parts.append(f"<div>{links}</div>")
    parts.append(f"<footer>© 2026 {rng.choice(_WORDS)} — all rights reserved</footer>")
    parts.append("</body></html>")
    return "".join(parts)


def fake_media_content(lines: list[str], sleep_s: float = 0.0) -> bytes:
    payload: dict = {"lines": lines}
    if sleep_s:
        payload["sleep_s"] = sleep_s
    return FAKE_MAGIC + json.dumps(payload, ensure_ascii=False).encode("utf-8")


def build_doc(
    seed: int,
    d: int,
    heavy_frac: float = 0.02,
    ine_frac: float = 0.30,
    broken_frac: float = 0.01,
) -> tuple[dict, list[dict]]:
    """Generate ONE document (span_row, its media_rows) — pure function of
    (seed, d), so any doc can be re-materialized in isolation on any executor
    (this is what makes the distributed generator and resume tests cheap)."""
    rng = Random(f"{seed}/{d}")
    doc_id = f"doc_{d:06d}"
    heavy = rng.random() < heavy_frac
    n_spans = rng.randint(50, 200) if heavy else rng.randint(1, 12)

    spans: list[dict] = []
    media_rows: list[dict] = []
    offset = 0
    for s in range(n_spans):
        is_media = rng.random() < (0.9 if heavy else 0.3)
        if is_media:
            media_ref = f"m_{d:06d}_{s:03d}"
            if rng.random() < ine_frac:
                truth = gen_ine_lines(rng)
            else:
                truth = gen_generic_lines(rng)
            broken = rng.random() < broken_frac
            content = b"NOTANIMG" if broken else fake_media_content(truth)
            media_rows.append({
                "media_ref": media_ref,
                "content": content,
                "fmt": rng.choice(["img", "pdf_page"]),
                "width": rng.choice([640, 1280, 1920]),
                "height": rng.choice([480, 720, 1080]),
                "truth_lines": truth,
            })
            spans.append({"kind": "media", "text": None,
                          "media_ref": media_ref, "offset": offset})
        else:
            text = (gen_html_text(rng) if rng.random() < 0.6
                    else gen_plain_text(rng))
            spans.append({"kind": "text", "text": text,
                          "media_ref": None, "offset": offset})
        offset += rng.randint(1, 3)

    return {"doc_id": doc_id, "spans": spans}, media_rows


def build_corpus(
    seed: int,
    n_docs: int,
    heavy_frac: float = 0.02,
    ine_frac: float = 0.30,
    broken_frac: float = 0.01,
) -> tuple[list[dict], list[dict]]:
    """Return (span_rows, media_rows).

    span_rows: {doc_id, spans: [{kind,text,media_ref,offset}, ...]}
    media_rows: {media_ref, content, fmt, width, height, truth_lines}
    """
    span_rows: list[dict] = []
    media_rows: list[dict] = []
    for d in range(n_docs):
        span_row, doc_media = build_doc(
            seed, d, heavy_frac, ine_frac, broken_frac
        )
        span_rows.append(span_row)
        media_rows.extend(doc_media)
    return span_rows, media_rows


SPANS_SCHEMA_DDL = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)
MEDIA_SCHEMA_DDL = (
    "media_ref string, content binary, fmt string, width int, height int, "
    "truth_lines array<string>"
)


def corpus_dataframes(spark, seed: int, n_docs: int, **kwargs):
    """Materialize the corpus as Spark DataFrames."""
    span_rows, media_rows = build_corpus(seed, n_docs, **kwargs)
    spans_df = spark.createDataFrame(
        [(r["doc_id"],
          [(s["kind"], s["text"], s["media_ref"], s["offset"])
           for s in r["spans"]])
         for r in span_rows],
        schema=SPANS_SCHEMA_DDL,
    )
    media_df = spark.createDataFrame(
        [(m["media_ref"], m["content"], m["fmt"], m["width"], m["height"],
          m["truth_lines"]) for m in media_rows],
        schema=MEDIA_SCHEMA_DDL,
    )
    return spans_df, media_df
