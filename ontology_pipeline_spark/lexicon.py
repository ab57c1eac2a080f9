"""Ontology lexicon — the broadcast vocabulary / alias dictionary.

The reference constrains extraction to a fixed hand-written vocabulary
(reference config/ontology_schema.py:2-28 and the entity-class definitions +
canonical examples in src/prompts.py:14-45, e.g. construct examples "Sleep
Quality", "Heart Rate Variability"; technology examples "Oura Ring",
"Polar H10").  Here that vocabulary becomes a small DataFrame that is
broadcast to every executor: it is simultaneously

* the schema constraint for mention detection (only lexicon surface forms
  become mentions — mirroring "use terminology from examples when possible",
  reference src/prompts.py:82), and
* the alias dictionary for entity linking (exact-match fast path +
  MinHash-LSH candidate blocking for fuzzy surfaces).

At 100 TB the lexicon stays tiny (thousands of rows) while pages are huge,
so every lexicon join in the engine is a broadcast hash join — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schemas import LEXICON

# entity_class -> canonical_name -> (parent, unit)
# Vocabulary mirrors the reference's public ontology schema and prompt
# examples (config/ontology_schema.py:7-27, src/prompts.py:17-43).
ONTOLOGY_VOCAB: dict[str, list[tuple[str, str | None, str | None]]] = {
    "domain": [
        ("Physical Health", "Health", None),
        ("Female Health", "Health", None),
        ("Cardiovascular Health", "Health", None),
        ("Cognitive Health", "Health", None),
        ("Stress & Adaptation", "Health", None),
        ("Mental Health", "Health", None),
        ("Recovery", "Health", None),
        ("Performance", "Performance", None),
        ("Metabolic Health", "Health", None),
    ],
    "construct": [
        ("Breast Health", "Female Health", None),
        ("Blood Pressure Control", "Cardiovascular Health", None),
        ("Fall Risk", "Physical Health", None),
        ("Body Composition", "Physical Health", None),
        ("Sleep Quality", "Recovery", None),
        ("Functional Mobility", "Physical Health", None),
        ("Muscular Power", "Performance", None),
        ("Heart Rate Variability", "Cardiovascular Health", None),
        ("Insulin Sensitivity", "Metabolic Health", None),
        ("Aerobic Capacity", "Cardiovascular Health", None),
    ],
    "assessment": [
        ("Countermovement Jump", None, None),
        ("Mammogram", None, None),
        ("Lipid Panel", None, None),
        ("VO2 Max Test", None, None),
        ("DEXA Scan", None, None),
        ("Sleep Study", None, None),
        ("24-hour Blood Pressure Monitoring", None, None),
        ("Hormone Panel", None, None),
    ],
    "technology": [
        ("VALD ForceDecks", None, None),
        ("Neurocatch", None, None),
        ("Oura Ring", None, None),
        ("COSMED", None, None),
        ("Polar H10", None, None),
        ("LabCorp", None, None),
        ("Quest Diagnostics", None, None),
        ("HRV4Training", None, None),
        ("Hologic DEXA", None, None),
        ("SpaceLabs", None, None),
    ],
    "metric": [
        ("Body Fat Percentage", None, "%"),
        ("Systolic Blood Pressure", None, "mmHg"),
        ("Jump Height", None, "cm"),
        ("HRV", None, "ms"),
        ("VO2 Max", None, "ml/kg/min"),
        ("Estradiol", None, "pg/mL"),
        ("Sleep Efficiency", None, "%"),
        ("RER", None, None),
    ],
    "intervention": [
        ("12-week Progressive Resistance Training", None, None),
        ("Personalized Nutrition Plan", None, None),
        ("Sleep Restriction Therapy", None, None),
        ("HRV Biofeedback Training", None, None),
        ("Aerobic Exercise Training", None, None),
        ("Light Therapy", None, None),
    ],
}

# Hand-curated abbreviation / variant aliases (deterministic; exercise the
# exact-match fast path vs the LSH fallback in entity linking).
# NOTE: "HRV" is deliberately NOT an alias of the construct "Heart Rate
# Variability" because it is already the canonical name of the metric "HRV";
# surface forms are unique per lexicon to keep mention detection deterministic.
EXTRA_ALIASES: dict[str, list[str]] = {
    "VO2 Max Test": ["VO2max Test", "V02 Max Test"],
    "VO2 Max": ["VO2max"],
    "Countermovement Jump": ["CMJ"],
    "DEXA Scan": ["DXA Scan"],
    "Body Fat Percentage": ["Body Fat %"],
    "Systolic Blood Pressure": ["SBP"],
    "Blood Pressure Control": ["BP Control"],
    "24-hour Blood Pressure Monitoring": ["24h Blood Pressure Monitoring"],
}


# Metric -> producing assessment (reference documents carry a per-metric
# `assessment_source`, src/prompts.py:160-168 and streamlit_app.py:176,:504;
# the reference's values are LLM-derived free text — here the deterministic
# analog is this curated ontology mapping).  Metrics with no canonical
# source assessment in the vocabulary stay unmapped (null in documents).
METRIC_SOURCE: dict[str, str] = {
    "Body Fat Percentage": "DEXA Scan",
    "Systolic Blood Pressure": "24-hour Blood Pressure Monitoring",
    "Jump Height": "Countermovement Jump",
    "VO2 Max": "VO2 Max Test",
    "RER": "VO2 Max Test",
    "Estradiol": "Hormone Panel",
    "Sleep Efficiency": "Sleep Study",
}

# Technology -> (vendor_manufacturer, technology_type, specific_model)
# (reference `technology_vendor` shape: name/type/specific_equipment,
# src/prompts.py:131-135).  Public vendor facts only; unknown model stays
# null rather than fabricated.
TECH_INFO: dict[str, tuple[str, str, str | None]] = {
    "VALD ForceDecks": ("VALD", "hardware", "ForceDecks"),
    "Neurocatch": ("NeuroCatch Inc.", "hardware", "NeuroCatch Platform"),
    "Oura Ring": ("Oura", "hardware", None),
    "COSMED": ("COSMED", "hardware", None),
    "Polar H10": ("Polar", "hardware", "H10"),
    "LabCorp": ("LabCorp", "service", None),
    "Quest Diagnostics": ("Quest Diagnostics", "service", None),
    "HRV4Training": ("HRV4Training", "software", None),
    "Hologic DEXA": ("Hologic", "hardware", None),
    "SpaceLabs": ("Spacelabs Healthcare", "hardware", None),
}


# Assessment -> modality, from the reference's public modality enum
# (config/ontology_schema.py:23-27: Physical test, Wearable monitoring,
# Consultation, Cognitive assessment, Survey, Imaging, Labs/bloodwork,
# Intake, Prevention; per-assessment field at src/prompts.py:565-571).
# Curated deterministic mapping like METRIC_SOURCE; "Hormone Panel" is
# deliberately unmapped so the null-modality path stays exercised.
ASSESSMENT_MODALITY: dict[str, str] = {
    "Countermovement Jump": "Physical test",
    "Mammogram": "Imaging",
    "Lipid Panel": "Labs/bloodwork",
    "VO2 Max Test": "Physical test",
    "DEXA Scan": "Imaging",
    "Sleep Study": "Wearable monitoring",
    "24-hour Blood Pressure Monitoring": "Wearable monitoring",
}

# Intervention -> intervention_types, from the reference's public enum
# (config/ontology_schema.py:19-22: Physical, Nutrition, Sleep, Stress
# Management, Medical, Education, Recovery; per-intervention list at
# src/prompts.py:589-596).  "Light Therapy" is deliberately unmapped so the
# null-types path stays exercised.
INTERVENTION_TYPES: dict[str, list[str]] = {
    "12-week Progressive Resistance Training": ["Physical"],
    "Personalized Nutrition Plan": ["Nutrition"],
    "Sleep Restriction Therapy": ["Sleep"],
    "HRV Biofeedback Training": ["Stress Management"],
    "Aerobic Exercise Training": ["Physical"],
}


def _case_variants(name: str) -> list[str]:
    """Deterministic surface variants: lowercase and hyphenated forms."""
    out = [name]
    low = name.lower()
    if low != name:
        out.append(low)
    if " " in name and not any(ch.isdigit() for ch in name):
        out.append(name.replace(" ", "-").lower())
    return out


def lexicon_rows(
    vocab: dict[str, list[tuple[str, str | None, str | None]]] | None = None,
    extra_aliases: dict[str, list[str]] | None = None,
) -> list[tuple[str, str, str, str | None, str | None]]:
    """Flatten the vocabulary into (entity_class, canonical, alias, parent, unit)
    rows — one row per surface form."""
    vocab = ONTOLOGY_VOCAB if vocab is None else vocab
    extra_aliases = EXTRA_ALIASES if extra_aliases is None else extra_aliases
    rows: list[tuple[str, str, str, str | None, str | None]] = []
    seen: set[tuple[str, str]] = set()
    for entity_class, entries in vocab.items():
        for canonical, parent, unit in entries:
            surfaces = _case_variants(canonical) + extra_aliases.get(canonical, [])
            for s in surfaces:
                key = (entity_class, s.lower())
                if key in seen:
                    continue
                seen.add(key)
                rows.append((entity_class, canonical, s, parent, unit))
    return rows


def lexicon_df(spark: SparkSession, rows=None) -> DataFrame:
    """Lexicon as a DataFrame (broadcast side of every linking join)."""
    return spark.createDataFrame(rows or lexicon_rows(), schema=LEXICON)


def simple_lexicon(terms: dict[str, list[str]]) -> list[tuple[str, str, str, str | None, str | None]]:
    """Build a lexicon from {entity_class: [term, ...]} with identity aliases.

    Used to parameterize mention detection over arbitrary corpora (e.g. the
    driver's `documents` table, whose vocabulary is synthetic tokens).
    """
    rows = []
    for entity_class, names in terms.items():
        for name in names:
            rows.append((entity_class, name, name, None, None))
    return rows
