"""Centralized scoring/behavior tunables.

The reference keeps every cognitive-dynamics parameter in one file
(``src/constants.rs``, 3.4k lines) so behavior parity is auditable; this module
plays the same role. Each value mirrors the reference's published parameter
(cited by ``constants.rs`` line where it came from). Env overrides use the same
``SHODH_*`` names the reference reads so harness/ablation workflows carry over.

Only parameters actually consumed by this build are included; new ones are
added as the corresponding subsystem lands.
"""

from __future__ import annotations

import os

# ---------------------------------------------------------------------------
# env helpers (reference: scattered std::env::var reads, e.g. mod.rs:49-105)
# ---------------------------------------------------------------------------


def env_flag(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() in ("1", "true", "yes", "on")


def env_float(name: str, default: float) -> float:
    v = os.environ.get(name)
    if v is None:
        return default
    try:
        return float(v)
    except ValueError:
        return default


def env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    if v is None:
        return default
    try:
        return int(v)
    except ValueError:
        return default


# ---------------------------------------------------------------------------
# Embedding / vector space (reference: src/embeddings/minilm.rs)
# ---------------------------------------------------------------------------

EMBED_DIM = 384  # MiniLM-L6-v2 output dimension
MAX_TOKENS = 256  # encoder sequence cap (minilm.rs)
CHUNK_TOKENS = 200  # fixed chunk size for long content (chunking.rs:1-23)
CHUNK_OVERLAP = 50  # overlap between consecutive chunks

# Embedding caches (reference: moka LRU, 10k entries, mod.rs:216-232)
EMBED_CACHE_MAX = 10_000

# ---------------------------------------------------------------------------
# Importance model (constants.rs:548-593, mod.rs:6033-6140)
# ---------------------------------------------------------------------------

IMPORTANCE_TYPE_BASE = {
    "decision": 0.30,
    "error": 0.25,
    "learning": 0.25,
    "discovery": 0.20,
    "pattern": 0.20,
    "task": 0.15,
    "conversation": 0.10,
    "context": 0.10,
    "observation": 0.10,
}
IMPORTANCE_TYPE_DEFAULT = 0.05
IMPORTANCE_FLOOR = 0.05  # constants.rs:48
IMPORTANCE_RECENCY_BOOST = 0.20  # constants.rs:590
IMPORTANCE_RECENCY_DAYS = 7.0  # constants.rs:593
IMPORTANCE_ENTITY_BOOST = 0.04  # constants.rs:570
IMPORTANCE_ENTITY_MAX = 3  # constants.rs:573
IMPORTANCE_CONNECTIVITY_BOOST = 0.03  # constants.rs:580
IMPORTANCE_CONNECTIVITY_MAX = 5  # constants.rs:583

# ---------------------------------------------------------------------------
# Memory tiers (constants.rs:827-889)
# ---------------------------------------------------------------------------

DEFAULT_WORKING_MEMORY_SIZE = 100
DEFAULT_SESSION_MEMORY_SIZE_MB = 100
DEFAULT_IMPORTANCE_THRESHOLD = 0.7
TIER_PROMOTION_WORKING_IMPORTANCE = 0.35
TIER_PROMOTION_WORKING_AGE_SECS = 1800
TIER_PROMOTION_SESSION_IMPORTANCE = 0.5
TIER_PROMOTION_SESSION_AGE_SECS = 86400

# ---------------------------------------------------------------------------
# Retrieval / fusion (constants.rs:395-510, 1129-1140; hybrid_search.rs:69-71)
# ---------------------------------------------------------------------------

DEFAULT_MAX_RESULTS = 10
VECTOR_SEARCH_CANDIDATE_MULTIPLIER = 3  # recall pools k*3 (mod.rs L3; k*5 measured worse: pool noise dilutes fusion)
HYBRID_SEMANTIC_WEIGHT = 0.5
HYBRID_GRAPH_WEIGHT = 0.35
HYBRID_LINGUISTIC_WEIGHT = 0.15
BM25_DEFAULT_WEIGHT = 0.35  # hybrid_search.rs:69-71
# Per-domain Okapi parameters (round 3; reference runs one global k1/b —
# hybrid_search.rs:33-35 — this build scopes the dialogue retune per
# document class; see retrieval/bm25.py CLASS_* and BENCHMARKS.md).
# Class 0 (dialogue): k1 0.6 / b 0.3 (round-2 retune, measured on turns).
# Class 1 (prose notes): classic Okapi 1.2 / 0.75.
BM25_K1_DIALOGUE = env_float("SHODH_BM25_K1", 0.6)
BM25_B_DIALOGUE = env_float("SHODH_BM25_B", 0.3)
BM25_K1_NOTES = env_float("SHODH_BM25_K1_NOTES", 1.2)
BM25_B_NOTES = env_float("SHODH_BM25_B_NOTES", 0.75)
# FLAT fusion consensus, domain-scoped the same way (fusion.py sweep
# notes; store-majority document class picks the default at recall time).
# 0.4 -> 0.35 in the round-3-extension joint re-test (another inverted
# old optimum: the pre-extension sweep had 0.3 costing map; under the
# 2-back + wide-PRF space 0.35 + companion 0.1 is all-5->= with r@10
# .7039->.7069 and map/ndcg/mrr strictly up)
FLAT_CONSENSUS_DIALOGUE = 0.35
FLAT_CONSENSUS_NOTES_V = 0.5
RRF_K_HYBRID_FUSION = 45.0
RRF_K_GRAPH_FUSION = 30.0

# Density-based fusion trust (constants.rs:478-510, graph_retrieval.rs:81-127)
DENSITY_GRAPH_WEIGHT_MIN = 0.1
DENSITY_GRAPH_WEIGHT_MAX = 0.5
DENSITY_LINGUISTIC_WEIGHT = 0.15
DENSITY_THRESHOLD_MIN = 0.5  # edges/entity at/below -> sparse (max graph trust)
DENSITY_THRESHOLD_MAX = 2.0  # edges/entity at/above -> dense (min graph trust)

# Polar/negation query handling (constants.rs:435-461)
POLAR_QUERY_BM25_POOL_MULTIPLIER = 3
POLAR_QUERY_VECTOR_POOL_MULTIPLIER = 2

# ---------------------------------------------------------------------------
# L5 unified scoring (constants.rs:1194-1300, 1426-1447, 1592-1593)
# final = base * importance_factor
#       * min(2.5, 1 + recency + arousal + credibility + temporal)
#       * feedback_momentum * tag_penalty
# ---------------------------------------------------------------------------

SCORING_IMPORTANCE_FLOOR = 0.7
SCORING_IMPORTANCE_RANGE = 0.3
SCORING_BOOST_CAP = 2.5
RECENCY_BOOST_SCALE = 0.5
RECENCY_DECAY_RATE = 0.01  # per hour, exp(-rate * hours_old)
AROUSAL_BOOST_SCALE = 0.15
CREDIBILITY_BOOST_SCALE = 0.2
ACTIVATION_BONUS_SCALE = 0.3
SAME_EPISODE_BOOST = 0.3
TEMPORAL_MATCH_BOOST_EXACT = 0.5
TEMPORAL_MATCH_BOOST_WEEK = 0.3
TEMPORAL_MATCH_BOOST_MONTH = 0.1
TEMPORAL_PREFILTER_BOOST = 0.15
FEEDBACK_MOMENTUM_SCALE = 0.50
AUTO_CAPTURED_TAG_PENALTY = 0.85
ASSISTANT_RESPONSE_TAG_PENALTY = 0.90
TAG_RELEVANCE_BOOST = 0.05

# Boost-stack scales for pre-filter layers (constants.rs:1165-1393)
ATTRIBUTE_QUERY_BOOST = 1.5
TEMPORAL_FACT_BOOST = 1.0
GEO_INJECT_FLOOR = 0.05
MAX_GEO_PREFETCH_CANDIDATES = 3
PROSPECTIVE_BOOST_PER_MATCH = 0.25
PROSPECTIVE_BOOST_MAX = 0.75
SEED_COVERAGE_BONUS = 1.0

# Ontological re-rank gating (constants.rs:1088-1110)
ONTOLOGICAL_MIN_CONFIDENCE = 0.3
ONTOLOGICAL_DENSITY_THRESHOLD = 8.0
ONTOLOGICAL_RERANK_BOOST = 0.08
ONTOLOGICAL_RERANK_MAX = 0.25

# ---------------------------------------------------------------------------
# Hebbian plasticity & LTP (constants.rs:24-37, 167-202, 1609-1907)
# ---------------------------------------------------------------------------

HEBBIAN_BOOST_HELPFUL = 0.025
HEBBIAN_DECAY_MISLEADING = 0.10
EDGE_INITIAL_STRENGTH = 0.5
EDGE_MIN_STRENGTH = 0.05
EDGE_HALF_LIFE_HOURS = 24.0
MAX_ENTITY_DEGREE = 500
# PMI² edge gate (state.rs:3477-3499, default ON there since 2026-07: a
# generic co-occurrence edge whose birth PMI = log2(N / (df_a * df_b)) is
# below the floor is incidental — two frequent entities sharing a passage
# by chance — and is never stored. Typed edges (cue/semantic/label-pair/
# OpenIE) always survive. Reference A/B: −97.4% edges, recall unchanged;
# their issue #90 measured 240k edges from 3k memories without it.
# OUR default is OFF: this graph never had their bloat (label-pair typing
# + 16-entity cap + degree caps → 1.3 edges/memory vs their ~79), and the
# full-suite A/B measured the gate −0.13pp p@1 / −0.09pp ndcg at exactly
# -1.5% edges — pruning costs a little signal and buys nothing here
# (BENCHMARKS "PMI² edge gate"). Arm it for hub-dominated stores.
GRAPH_PMI_GATE = env_flag("SHODH_GRAPH_PMI_GATE", False)
GRAPH_PMI_GATE_MIN = env_float("SHODH_GRAPH_PMI_GATE_MIN", 0.0)
# Typed-only cull (state.rs:3500-3512): drop EVERY generic co-occurrence
# edge, keeping only typed + causal structure. Aggressive (CoOccurs also
# carries spreading connectivity) — measured lever, not a default.
GRAPH_TYPED_ONLY = env_flag("SHODH_GRAPH_TYPED_ONLY", False)
# PMI edge WEIGHTING (state.rs:3467-3476, default off there: measured
# neutral-to-slightly-negative): scale a kept generic edge's initial
# strength by its normalized positive PMI so incidental-but-kept edges
# are born weak.
GRAPH_PMI_EDGES = env_flag("SHODH_GRAPH_PMI_EDGES", False)
LTP_LEARNING_RATE = 0.1
LTP_THRESHOLD = 10
LTP_TIME_AWARE_THRESHOLD = 5
LTP_TIME_AWARE_DAYS = 30
LTP_DECAY_FACTOR = 0.1  # Full LTP: 10x slower decay
LTP_BURST_THRESHOLD = 5
LTP_BURST_WINDOW_HOURS = 24
LTP_BURST_DECAY_FACTOR = 0.5
LTP_BURST_DURATION_HOURS = 48
LTP_WEEKLY_THRESHOLD = 3
LTP_WEEKLY_MIN_WEEKS = 2
LTP_WEEKLY_DECAY_FACTOR = 0.3
LTP_MIN_STRENGTH = 0.01
LTP_PRUNE_FLOOR = 0.05
ACTIVATION_HISTORY_L2_CAPACITY = 30
ACTIVATION_HISTORY_L3_CAPACITY = 200
LTP_STRENGTH_FLOOR_L2 = 0.65
LTP_STRENGTH_FLOOR_L3 = 0.80
LTP_READINESS_COUNT_WEIGHT = 0.5
LTP_READINESS_STRENGTH_WEIGHT = 0.5
LTP_READINESS_TAG_WEIGHT = 0.3
LTP_READINESS_THRESHOLD = 1.0
LTP_THRESHOLD_MIN = 7
LTP_THRESHOLD_MAX = 13
STRENGTHEN_IMPORTANCE_FLOOR = 0.2
HOMEOSTASIS_SCALING_FACTOR = 0.995
GRAPH_LATERAL_INHIBITION_STRENGTH = 0.15
GRAPH_LATERAL_INHIBITION_THRESHOLD = 0.80
EDGE_TIER_TRUST = {"L1": 0.20, "L2": 0.50, "L3": 0.80, "LTP": 0.95}
ENTITY_CONCEPT_MERGE_THRESHOLD = 0.85

# Edge tiers (constants.rs:2539-2640): L1 working / L2 episodic / L3 semantic
L1_INITIAL_WEIGHT = 0.4
L1_DECAY_PER_HOUR = 0.029
L1_MAX_AGE_HOURS = 48
L1_PRUNE_THRESHOLD = 0.1
L1_PROMOTION_THRESHOLD = 0.5
L2_PROMOTION_WEIGHT = 0.5
L2_DECAY_PER_DAY = 0.031
L2_MAX_AGE_DAYS = 30
L2_PRUNE_THRESHOLD = 0.2
L2_PROMOTION_THRESHOLD = 0.7
L3_PROMOTION_WEIGHT = 0.7
L3_DECAY_PER_MONTH = 0.02
L3_PRUNE_THRESHOLD = 0.3
EDGE_PROMOTION_MEMORY_BOOST_L2 = 0.015
EDGE_PROMOTION_MEMORY_BOOST_L3 = 0.03

# L3 experiences time at this fraction of L2's rate (decay.rs:102)
L3_TIME_SCALE_VS_L2 = (L3_DECAY_PER_MONTH / 30.0) / L2_DECAY_PER_DAY

# ---------------------------------------------------------------------------
# Decay math (constants.rs:2022-2056; decay.rs:126-180) — Wixted (2004)
# exponential consolidation phase -> power-law long-term phase
# ---------------------------------------------------------------------------

DECAY_CROSSOVER_DAYS = 3.0
POWERLAW_BETA = 0.5
POWERLAW_BETA_POTENTIATED = 0.3
DECAY_LAMBDA_CONSOLIDATION = 0.693  # ln(2) per day
EMOTIONAL_DECAY_MODULATION = 0.3
IMPORTANCE_DECAY_MIN = 0.05
IMPORTANCE_DECAY_MAX = 0.15

# ---------------------------------------------------------------------------
# Spreading activation (constants.rs:991-1060; graph_retrieval.rs)
# ---------------------------------------------------------------------------

SPREADING_DECAY_RATE = 0.5
SPREADING_MAX_HOPS = 6
SPREADING_MIN_HOPS = 3
SPREADING_ACTIVATION_THRESHOLD = 0.005
SPREADING_RELAXED_THRESHOLD = 0.001
SPREADING_MIN_CANDIDATES = 5
SPREADING_EARLY_TERMINATION_RATIO = 0.05
SPREADING_EARLY_TERMINATION_CANDIDATES = 50
SPREADING_NORMALIZATION_FACTOR = 2.0
SPREADING_DEGREE_NORMALIZATION = True
SPREADING_EDGE_CAP = 100  # max edges expanded per node per spread
# Above this entity count the CSR device spreader replaces the host walk
# (host bidirectional re-spreads are O(seeds * E); the device variant
# batches all seeds in one vmapped propagation)
SPREADING_DEVICE_MIN_ENTITIES = 2048
# Graph cue expansion (mod.rs:2760-3330): top-K 1-hop bridge entities of
# the query seeds join the BM25 query as weighted extra cues
GRAPH_CUE_EXPANSION_MAX = 3
GRAPH_CUE_TERM_WEIGHT = 0.3
# Beam traversal (graph_retrieval.rs:1011)
BEAM_WIDTH_DEFAULT = 8
BEAM_MAX_DEPTH = 4
SALIENCE_BOOST_FACTOR = 1.0
BIDIRECTIONAL_MIN_ENTITIES = 2
BIDIRECTIONAL_INTERSECTION_BOOST = 1.5
BIDIRECTIONAL_INTERSECTION_MIN = 0.0025
BIDIRECTIONAL_HOPS_DENSE = 2
BIDIRECTIONAL_HOPS_MEDIUM = 3
BIDIRECTIONAL_HOPS_SPARSE = 4
BIDIRECTIONAL_DENSITY_SPARSE = 0.5
BIDIRECTIONAL_DENSITY_DENSE = 2.0
PPR_ALPHA = 0.5  # personalized PageRank restart prob (graph_retrieval.rs:692)
PPR_ITERS = 30
PPR_MAX_NODES = 5000

# Memory-tier trust multiplier for graph-derived evidence (constants.rs:1507-1531)
MEMORY_TIER_GRAPH_MULT = {
    "working": 0.3,
    "session": 0.6,
    "longterm": 1.0,
    "archive": 1.2,
}

# ---------------------------------------------------------------------------
# Interference & competition (constants.rs:2268-2396)
# ---------------------------------------------------------------------------

INTERFERENCE_SIMILARITY_THRESHOLD = 0.85
INTERFERENCE_SEVERE_THRESHOLD = 0.95
INTERFERENCE_RETROACTIVE_DECAY = 0.1
INTERFERENCE_PROACTIVE_DECAY = 0.05
INTERFERENCE_PROACTIVE_THRESHOLD = 0.8
INTERFERENCE_COMPETITION_FACTOR = 0.15
INTERFERENCE_VULNERABILITY_HOURS = 24
INTERFERENCE_MAX_TRACKED = 10
INTERFERENCE_ACTIVATION_FLOOR = 0.05
COMPETITION_CLOSE_RATIO = 0.9
INJECTION_MIN_RELEVANCE = 0.50  # injection.rs:136 — floor for proactive surfacing
COMPETITION_SUPPRESSION_SCALE = 10.0
COMPETITION_SURVIVAL_FLOOR = 0.1
COMPETITION_SURVIVOR_DAMAGE_RATIO = 0.3
COMPETITION_SUPPRESSED_DEMOTION = 0.9

# ---------------------------------------------------------------------------
# Replay (constants.rs:2198-2250)
# ---------------------------------------------------------------------------

REPLAY_IMPORTANCE_THRESHOLD = 0.3
REPLAY_MAX_AGE_DAYS = 14
REPLAY_AROUSAL_THRESHOLD = 0.6
REPLAY_STRENGTH_BOOST = 0.05
REPLAY_EDGE_BOOST = 0.08
REPLAY_BATCH_SIZE = 50
REPLAY_CONNECTIVITY_DIVISOR = 10.0
REPLAY_CONNECTIVITY_MAX_BOOST = 0.5

# ---------------------------------------------------------------------------
# Consolidation & facts (constants.rs:605-733)
# ---------------------------------------------------------------------------

CONSOLIDATION_MIN_SUPPORT_SMALL = 2
CONSOLIDATION_MIN_SUPPORT_MEDIUM = 3
CONSOLIDATION_MIN_SUPPORT_LARGE = 4
CONSOLIDATION_CLUSTER_SIZE_CAP = 20
CONSOLIDATION_MIN_AGE_DAYS = 7
CONSOLIDATION_JACCARD_THRESHOLD = 0.45
CONSOLIDATION_MAX_CANDIDATES_PER_MEMORY = 5
CONSOLIDATION_SALIENT_MIN_CONTENT_WORDS = 4
FACT_DECAY_GRACE_DAYS = 90
FACT_DECAY_HALF_LIFE_BASE_DAYS = 180.0
FACT_DECAY_HALF_LIFE_PER_SUPPORT_DAYS = 30.0
FACT_DEDUP_COSINE_THRESHOLD = 0.80
FACT_DEDUP_JACCARD_FLOOR = 0.30
FACT_DEDUP_JACCARD_FALLBACK = 0.75
COMPRESSION_IMPORTANCE_HIGH = 0.8
COMPRESSION_IMPORTANCE_LOW = 0.5
COMPRESSION_AGE_DAYS = 30
COMPRESSION_ACCESS_THRESHOLD = 10

# ---------------------------------------------------------------------------
# Feedback momentum & prediction error (constants.rs:142-153, 2745-2792)
# ---------------------------------------------------------------------------

PREDICTION_ERROR_MIN_MULTIPLIER = 0.5
PREDICTION_ERROR_MAX_MULTIPLIER = 2.0
TEMPORAL_DISCOUNT_GAMMA = 0.70
FEEDBACK_WINDOW_SIZE = 5
FEEDBACK_SESSION_GAP_SECS = 1800
SESSION_COMPLETION_BOOST = 0.15
SESSION_ABANDONMENT_PENALTY = -0.10
SESSION_REENGAGEMENT_BOOST = 0.20

# ---------------------------------------------------------------------------
# NER / entities (constants.rs:3287-3330)
# ---------------------------------------------------------------------------

NER_ENTITY_MIN_LENGTH = 3
NER_GRAPH_CONFIDENCE_FLOOR = 0.6
ENTITY_SALIENCE_HELPFUL_BOOST = 0.03
ENTITY_SALIENCE_MISLEADING_PENALTY = -0.05
ENTITY_SALIENCE_FILTER_FLOOR = 0.15
ENTITY_SALIENCE_FILTER_MIN_MENTIONS = 5
ENTITY_COOCCURRENCE_THRESHOLD = 0.4
SELECTIVITY_STOP_WORD_THRESHOLD = 0.5
SELECTIVITY_HALF_SAT = 0.5
# Concept dedup: a NEW entity whose name embedding hits >= this cosine
# against an existing LABEL-COMPATIBLE node merges into it as an alias
# (graph_memory.rs:3390 add_entity 0.85-cosine dedup)
# Typed base salience (graph_memory.rs:8722-8768): an entity's starting
# "gravitational well" depends on its label; proper nouns get a 1.2x boost
# (capped 1.0). Mentions then grow it by salience *= 1 + 0.1*ln(mentions)
# (graph_memory.rs:3489-3493). Keyed by OUR 18 coarse labels, values
# mapped from the reference's 37-label table.
# Measured: gate bit-identical; full suite slightly NEGATIVE on all five
# (r@10 .7048->.7041, p@1 -0.13pp) — the label-typed wells bias spreading
# seeds toward person/org hubs, which our saturating rule avoids. Ships
# OFF; the reference's formula stays available for parity experiments.
TYPED_SALIENCE = env_flag("SHODH_TYPED_SALIENCE", False)
SALIENCE_BASE = {
    "person": 0.8, "organization": 0.7, "location": 0.6, "facility": 0.5,
    "product": 0.7, "technology": 0.6, "event": 0.6, "work_of_art": 0.6,
    "law": 0.55, "language": 0.55, "date": 0.3, "time": 0.3,
    "quantity": 0.35, "money": 0.4, "percent": 0.35, "concept": 0.4,
    "group": 0.55, "other": 0.3,
}
SALIENCE_PROPER_BOOST = 1.2
SALIENCE_FREQ_COEF = 0.1
GRAPH_CONCEPT_DEDUP_COSINE = 0.85
# find_entity's last tier: embedding-fuzzy match (graph_memory.rs:3777-3813)
GRAPH_FIND_FUZZY_COSINE = 0.80

# Topology protection for decay (constants.rs:1701-1726, 2837-2842)
TOPOLOGY_HYSTERESIS_DECAY = 0.5
TOPOLOGY_RESCUE_ALPHA = 0.6
TOPOLOGY_RESCUE_BUDGET_FRAC = 0.05
TOPOLOGY_RESCUE_MIN_PROTECTION = 1e-3
CURVATURE_MIN_EDGES = 10
CURVATURE_PATH_BOOST_SCALE = 0.05

# IC weights for query terms by POS (constants.rs:2071-2089)
IC_NOUN = 2.3
IC_ADJECTIVE = 1.7
IC_VERB = 1.0

# ---------------------------------------------------------------------------
# Lineage (constants.rs:2870-3045)
# ---------------------------------------------------------------------------

LINEAGE_MAX_TEMPORAL_GAP_DAYS = 14
LINEAGE_MIN_ENTITY_OVERLAP = 0.3
LINEAGE_MIN_EMBEDDING_SIMILARITY = 0.25
LINEAGE_MAX_CANDIDATES = 20
LINEAGE_LOOKBACK_DAYS = 7
# Ingest-throughput guards (BASELINE config 5): cap inferred edges per new
# memory and candidate reads per inference — on dense corpora unbounded
# inference was 64% of ingest time (profiled round 2)
LINEAGE_MAX_EDGES_PER_MEMORY = 8
LINEAGE_MAX_CANDIDATE_READS = 60
LINEAGE_CONFIDENCE = {
    "caused": 0.8,
    "resolved_by": 0.85,
    "informed_by": 0.7,
    "superseded_by": 0.6,
    "triggered_by": 0.75,
    "branched_from": 0.9,
    "related_to": 0.5,
}
LINEAGE_MIN_STORE_CONFIDENCE = 0.20
LINEAGE_RETRIEVAL_BOOST_SCALE = 0.06
LINEAGE_RETRIEVAL_MAX_BOOST = 0.15
LINEAGE_RETRIEVAL_MIN_CONFIDENCE = 0.5

# ---------------------------------------------------------------------------
# Pattern detection (constants.rs:2412-2514)
# ---------------------------------------------------------------------------

MIN_MEMORIES_PER_PATTERN = 3
MIN_CLUSTER_SIZE = 3
SEMANTIC_CLUSTER_THRESHOLD = 0.75
TEMPORAL_CLUSTER_WINDOW_SECS = 1800
HIGH_IMPORTANCE_THRESHOLD = 0.7
HIGH_AROUSAL_THRESHOLD = 0.7
SURPRISE_THRESHOLD = 0.3

# ---------------------------------------------------------------------------
# Device-index tunables (TPU-specific; no reference analog)
# ---------------------------------------------------------------------------

# Padded device-array growth quantum: arrays grow in multiples of this row
# count so XLA sees a small set of static shapes (avoids recompiles).
INDEX_CAPACITY_QUANTUM = 4096
# Default query batch size for the fused recall program (BASELINE config 2).
DEVICE_QUERY_BATCH = 256
# IVF: clusters = ceil(sqrt(N)) like SPANN (spann.rs); probe count default.
IVF_DEFAULT_NPROBE = 10
# The reference flips Vamana->SPANN at 100k (vector_db/mod.rs:53) because a
# CPU graph walk saturates there. Measured on v5e (round 5, tools/
# bench_8m.py): the EXACT certified path does 6,319 QPS/chip at 8M x 384
# int8 (20.3 ms/batch at B=128, certificate 2/2), while IVF at 8M is BOTH
# ~14x slower (nprobe=10: 119 ms for B=32 = 268 QPS — the scattered
# posting gather moves ~12 GB/s where the exact path's contiguous MXU
# scan moves ~150 GB/s) AND near-zero recall on unclustered vectors
# (r@10 vs exact .019 at nprobe 10; real embedding corpora cluster
# better, but a 14x speed deficit is not a recall problem). Exact wins
# until HBM CAPACITY forces tiering — a v5e chip holds ~12M int8 384-d
# rows beside the (B, N) bf16 pass-1 plane at B=128 — so the IVF floor
# sits at the measured capacity ceiling, not a latency crossover.
IVF_MIN_VECTORS = 12_000_000  # exact serves every tier that fits HBM
# PQ: 8-dim subvectors x 256 centroids (pq.rs:17-21)
PQ_SUBVECTOR_DIM = 8
PQ_CENTROIDS = 256

# ---------------------------------------------------------------------------
# Runtime kill switches (reference env-flag families, mod.rs:49-105)
# ---------------------------------------------------------------------------

ENV_EVAL_NOW = "SHODH_EVAL_NOW"  # pin the scoring clock (RFC3339)
ENV_RECALL_READONLY = "SHODH_RECALL_READONLY"  # suppress usage writes
ENV_DISABLE_BOOSTS = "SHODH_DISABLE_BOOSTS"  # comma-separated boost families


def disabled_boosts() -> frozenset[str]:
    raw = os.environ.get(ENV_DISABLE_BOOSTS, "")
    return frozenset(p.strip().lower() for p in raw.split(",") if p.strip())


def recall_readonly() -> bool:
    return env_flag(ENV_RECALL_READONLY, False)


# ---------------------------------------------------------------------------
# Corpus-adaptive semantics (models/semantic_model.py — no reference analog;
# substitutes for the trained-MiniLM semantic leg in zero-egress deployments)
# ---------------------------------------------------------------------------

# Master switch. Measured before defaulting ON: gate +1pp r@10 with every
# gated metric up (single_hop .571->.600, ties the reference's trained
# embedder); held-out 1,531-case suite is a wash (p@1 +0.2pp, r@10 equal)
# — no regression risk, clear gate win. Read at call time so harness
# sweeps can toggle per run.
def semantic_adapt_enabled() -> bool:
    return env_flag("SHODH_ADAPTIVE_SEMANTICS", True)


def semantic_blend_weight() -> float:
    # 0: the dense blend measured negative at every weight swept (0.15/0.3/
    # 0.5 — see BENCHMARKS.md); the model drives BM25 expansion only.
    return env_float("SHODH_SEM_WEIGHT", 0.0)
# Refit when the store grew by max(ABS, FRAC * fitted_n) since the last fit.
SEMANTIC_REFIT_MIN_ABS = env_int("SHODH_SEM_REFIT_ABS", 64)
SEMANTIC_REFIT_FRAC = env_float("SHODH_SEM_REFIT_FRAC", 0.5)
# Never fit below this corpus size (no distributional signal).
SEMANTIC_MIN_CORPUS = 32
# BM25 semantic expansion (query stems gain their nearest co-occurrence
# neighbors as low-weight extra terms; boost family "sem_expansion").
SEM_EXPANSION_PER_STEM = env_int("SHODH_SEM_EXP_PER_STEM", 3)
SEM_EXPANSION_MIN_SIM = env_float("SHODH_SEM_EXP_MIN_SIM", 0.45)  # 0.35 admits topical noise (gate -0.5pp)
SEM_EXPANSION_MAX_TERMS = env_int("SHODH_SEM_EXP_MAX_TERMS", 8)
SEM_EXPANSION_TERM_WEIGHT = env_float("SHODH_SEM_EXP_WEIGHT", 0.2)  # third re-sweep: 0.2 beat 0.4 alone, inverted under speaker 0.7, then RE-INVERTED under the wide PRF gate (p@1 .4226->.4246, mrr/map/ndcg up, r@10 -1 case) — expansion overlaps PRF, so lighter sem terms win once PRF covers more questions
# Document-side expansion (round 3): each BM25 doc inherits its distinctive
# stems' co-occurrence neighbors at SHODH_DOC_EXPANSION_WEIGHT * sim during
# adapt_semantics (0 = off; the weight itself is read in memory_system).
DOC_EXPANSION_TOP_STEMS = env_int("SHODH_DOC_EXP_TOP_STEMS", 6)
DOC_EXPANSION_PER_STEM = env_int("SHODH_DOC_EXP_PER_STEM", 2)
DOC_EXPANSION_MIN_SIM = env_float("SHODH_DOC_EXP_MIN_SIM", 0.5)
# Fit-corpus cap: refits sample the newest texts (deterministic by
# (created_at, id) desc) so maintenance never stalls on huge stores.
SEMANTIC_FIT_MAX_TEXTS = env_int("SHODH_SEM_FIT_MAX_TEXTS", 20000)
# Pseudo-relevance feedback (RM3-lite second BM25 pass; boost family "prf").
PRF_TOP_DOCS = env_int("SHODH_PRF_TOP_DOCS", 5)
PRF_TERMS = env_int("SHODH_PRF_TERMS", 6)
PRF_TERM_WEIGHT = env_float("SHODH_PRF_WEIGHT", 0.3)


def prf_enabled() -> bool:
    # ON: armed only for open-ended questions (polar / why / descriptive
    # how) with no date anchor. Measured: gate ndcg +0.14pp, mrr +0.17pp,
    # map +0.17pp at equal r@10/p@1; held-out suite a wash (r@10 -0.06pp
    # = ~1 case). Ungated PRF measured NEGATIVE (temporal -1.7pp) — the
    # question-type gate is what makes it shippable.
    return env_flag("SHODH_PRF", True)


def prf_ungated() -> bool:
    # CI re-measurement leg (exp-prf-gate-ab): drops the question-type
    # gate entirely. Ships FALSE — ungated PRF measured temporal −1.7pp.
    return env_flag("SHODH_PRF_UNGATED", False)


def prf_multihop() -> bool:
    # Widen the PRF gate to enumeration/multihop questions (no date
    # anchor): a found gold's vocabulary could pull sibling episodes into
    # the pool. Sweep pending — default FALSE until measured.
    return env_flag("SHODH_PRF_MULTIHOP", False)


def prf_any_nontemporal() -> bool:
    # Middle gate: PRF for ANY question shape except date-anchored /
    # temporal-seeking / multihop-intent. Post-2-back re-measure (the
    # stacked-knob lesson): full suite p@1 .4161->.4226, mrr +0.51pp,
    # map/ndcg up, r@10 .7048->.7036 (-2 cases); smoke r@10 +0.31pp /
    # ndcg +0.37pp at p@1 equal. Ships ON — the one deliberate departure
    # from the all->= bar: ~10 p@1 cases + both suites' precision for 2
    # r@10 cases, with p@1 the round-2 verdict's named thinnest margin.
    # PRF_TERM_WEIGHT re-swept under this gate: 0.3 dominates 0.2/0.45.
    # Fully ungated (temporal/multihop too) measured worse on every
    # metric than this gate; SHODH_PRF_MULTIHOP alone was flat-negative.
    return env_flag("SHODH_PRF_ANY_NONTEMPORAL", True)


# Recency scale for time-seeking queries ("when did X") — the event's age
# carries no relevance signal there; boost family "seek_recency_mute".
TEMPORAL_SEEK_RECENCY_SCALE = env_float("SHODH_SEEK_RECENCY_SCALE", 0.0)
# Context-augmented lexical indexing: each turn's BM25 doc inherits the
# previous same-context turn's terms at this weight (0 disables). Dialogue
# antecedents keep pronoun-heavy turns findable ("I've had them 3 years").
def context_index_weight() -> float:
    # The largest single quality lever of the build (full r@10
    # .5684->.6257 when it landed at 0.42). Re-swept after the k1/b
    # Okapi retune — the optimum moved up: 0.8 gave full r@10
    # .6771->.6837 (1.0 declined). Re-swept AGAIN after 2-back context
    # landed (stacked-knob lesson): under w2=0.25 the optimum moved to
    # 0.9 — full r@10 .7011->.7048 with ALL five metrics >= the 0.8 arm
    # (1.0 still declines: .7017 with p@1/mrr/map down).
    return env_float("SHODH_CONTEXT_INDEX_WEIGHT", 0.9)
# Forward context: when a successor turn arrives, its terms fold into the
# predecessor's BM25 doc once ("happened yesterday..." turns gain the next
# turn's "car accident"). 0 disables.
def context_forward_weight() -> float:
    # 0.6 swept on the held-out suite (0/.2/.42/.5/.6): full r@10
    # .6257->.6354, temporal +3.1pp, multi_hop +1.6pp, p@1/mrr best at 0.6.
    return env_float("SHODH_CONTEXT_FWD_WEIGHT", 0.6)
# Second-order backward context: the antecedent's OWN antecedent folds in
# at this weight (two turns back along the same tag chain). Same family as
# the 1-back win; 0 disables.
def context_index_weight2() -> float:
    # Full-suite sweep (0/.2/.25/.3/.35): r@10 .6926->.7011/.7014/.7012 at
    # .25/.3/.35 (a plateau), with .25 best on mrr/map/ndcg and p@1 only
    # -1 case vs baseline. Gate showed the same r@10 lift with a precision
    # dip — full suite decides (forward-context precedent). multi_hop
    # +1.2pp / open_domain +1pp: the first movement on the semantics-bound
    # floors since round 2.
    return env_float("SHODH_CONTEXT_INDEX_WEIGHT2", 0.25)


def context_index_weight3() -> float:
    # 3-back context: sweep pending — default 0 (off) until measured
    return env_float("SHODH_CONTEXT_INDEX_WEIGHT3", 0.0)


def context_forward_weight2() -> float:
    # 2-ahead forward context: sweep pending — default 0 until measured
    return env_float("SHODH_CONTEXT_FWD_WEIGHT2", 0.0)
# Dialogue speaker match: candidates whose utterance speaker ("Name: ...")
# is one of the query's entities get this multiplicative boost. Measured on
# locomo-full multi_hop: golds are subject-speaker turns at 0.86-0.90 rate
# vs 0.59-0.66 for non-golds. Family "speaker_match".
SPEAKER_MATCH_BOOST = env_float("SHODH_SPEAKER_MATCH_BOOST", 0.7)  # r2 swept 0.4 with rule-NER entities; r3 re-sweep after distilled NER: .3/.4/.55/.7/.85 — 0.7 peaks (full r@10 .6860, multi_hop +0.75pp, map/mrr/p@1/ndcg all up; .85 r@10 declines)
# Temporal diversity at final ranking: at most this many results from the
# same 2h window of one conversation inside the top-k (0 = off). Measured
# NEGATIVE at cap 2 and 3 (single_hop -10pp/-3pp, every category down):
# multi-gold sets are themselves temporally clustered, so the cap evicts
# golds. Kept as an off-by-default knob with the negative result recorded.
TEMPORAL_DIVERSITY_CAP = env_int("SHODH_DIVERSITY_CAP", 0)
# Time-seeking queries ("when did X"): candidates carrying extracted
# temporal expressions get this multiplicative boost — golds carry
# temporal_refs at 0.54 vs 0.10 for non-golds (locomo-full measurement).
# Family "seek_temporal_refs".
SEEK_TEMPORAL_REFS_BOOST = env_float("SHODH_SEEK_TREFS_BOOST", 0.45)  # r2 landed 0.3; r3 joint re-sweep with ANSWER_TYPE 0.4 lifts every full aggregate (r@10 .6860->.6869) — alone it traded r@10 for precision, composed it does not
# Answer-type matching for where/why questions (family "answer_type"):
# where -> toponym-bearing candidates, why -> causal-marker-bearing ones.
# Measured lifts 0.20-vs-0.08 / 0.18-vs-0.07 (weaker than the temporal
# signal; boost kept moderate).
ANSWER_TYPE_BOOST = env_float("SHODH_ANSWER_TYPE_BOOST", 0.4)  # r2 landed 0.25; r3 re-sweep .15/.25/.4/.55 — 0.4 peaks r@10 (+0.16pp), 0.55 overshoots; ships jointly with SEEK_TREFS 0.45 (all-aggregates-up combo)
# Full GeoNames cities15000 gazetteer (gazetteer/mod.rs:34-40; artifact
# built by tools/build_gazetteer.py). Off -> 239-entry builtin seed only.
# Free-text extraction guards single-token common-word homonyms ("split",
# "nice") behind capitalization evidence or metropolis population
# (nlp/gazetteer.py). locomo-full: all five aggregates up (p@1
# .4069->.4082), gate bit-identical, smoke within contract.
GAZETTEER_FULL = env_flag("SHODH_GAZETTEER_FULL", True)
# Irregular-lemma folding before Porter ("went"->"go"; nlp/lemmas.py,
# table distilled from the spaCy en_core_web_sm lemmatizer exceptions the
# reference embeds for parsing, dep_parser/en_core_web_sm/NOTICE). The
# reference bridges these forms with its MiniLM dense leg instead; a
# weight-blocked build closes the gap lexically. Resolved at import —
# never flips mid-process (stored postings would split).
LEMMA_FOLD = env_flag("SHODH_LEMMA_FOLD", True)
# Norm folding (nlp/norms.py, table from the same spaCy en_core_web_sm
# manifest): single-word canonicalization ("favourite"/"fave"->"favorite",
# "plz"->"please") inside stem(), and optionally contraction expansion
# in tokenize() ("gonna"->"going to", "can't"->"can not"). The reference
# carries spaCy NORM attrs through its parse features (hash.rs,
# tokenizer.rs rules); here the same data heals BM25 token mismatches.
# Resolved at import — never flips mid-process (stored postings).
# Mode sweep on the held-out full suite (BENCHMARKS "lexical
# canonicalization campaign"): hash-only beat both both-on and off on
# ALL FIVE aggregates (r@10 .6933 vs .6918/.6922); the contraction leg
# alone measured a uniform small negative (r@10 .6910) — expanding
# "can't"->can not deletes the token entirely once stopwords filter the
# pieces, a net information loss on this corpus. So "hash" ships as the
# default; "1" arms both legs, "contr" the expansion leg alone.
NORM_FOLD_MODE = os.environ.get("SHODH_NORM_FOLD", "hash").strip().lower()
# A mistyped value ("both", "hashs") must NOT fail open into folds-off:
# the fold feeds persisted postings, so a silent tokenization change
# splits old documents from new queries. Unrecognized -> warn + the
# documented 'hash' default.
_NORM_KNOWN = {"hash", "contr", "1", "true", "yes", "on", "0", "false", "no", "off", ""}
if NORM_FOLD_MODE not in _NORM_KNOWN:
    import warnings

    warnings.warn(
        f"SHODH_NORM_FOLD={NORM_FOLD_MODE!r} is not a recognized mode; "
        "using the 'hash' default (recognized: hash, contr, 1/on, 0/off)"
    )
    NORM_FOLD_MODE = "hash"
NORM_FOLD = env_flag("SHODH_NORM_FOLD", True) or NORM_FOLD_MODE in ("hash", "contr")
# OOV query-term spell correction (retrieval/spellfix.py): a query stem
# with ZERO postings may be replaced by an in-vocabulary stem at
# Damerau-Levenshtein 1 (SymSpell deletes-index; df-then-lexicographic
# pick). Strictly additive — clean queries cannot be rewritten. The
# reference's fuzzy handling lives at the entity tier only
# (graph_memory.rs:3080 Jaro-Winkler); this guards the lexical-first
# stack against typo token loss. Measured: smoke/gate byte-identical;
# locomo-full map/mrr/ndcg each +0.01pp (real typos recovered),
# r@10/p@1 exactly unchanged.
SPELLFIX = env_flag("SHODH_SPELLFIX", True)
