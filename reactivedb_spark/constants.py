"""System column names (reference: reactive_db/src/constants.rs:1-5).

``_seq`` is ours: a monotonically increasing engine-internal sequence that
makes "arrival order" explicit. The reference gets arrival order implicitly
from its single-threaded write path; a distributed engine must carry it as
data (SURVEY.md §7 "what's hard" #1 — Union last-writer-wins needs it).
"""

ENTRY_ID = "_entryId"
SOURCE_ENTRY_ID = "_sourceEntryId"
# JoinTransform (extension): provenance of the RIGHT parent row — joins
# have two origins, so cascading deletes need a second provenance column.
SOURCE_ENTRY_ID2 = "_sourceEntryId2"
MATCHING_KEY = "matchingKey"
AGGREGATED_COLUMN = "aggregatedColumn"
SEQ = "_seq"
# hash-bucket partition column for keyed (Union/Aggregation) tables —
# the columnar replacement for the reference's per-column B+tree index:
# key lookups prune to 1/N_KEY_BUCKETS of the files (SURVEY.md §1.1
# "Index" row: partition pruning / data skipping instead of indexes).
PARTITION_BUCKET = "_kb"
N_KEY_BUCKETS = 32
# DedupTransform merge key (extension transform — no reference analogue):
# md5 of the normalized key column, one representative row per value.
DEDUP_KEY = "dedupKey"
# TopKTransform group key (extension transform): md5 of the normalized
# group column — same convention as DEDUP_KEY so keyed state buckets
# identically across the keyed extension transforms.
GROUP_KEY = "groupKey"
# DistinctTransform tuple key (extension transform): md5 of the EXACT
# (unnormalized) sentinel-joined string forms of the projected columns.
DISTINCT_KEY = "distinctKey"
# DistinctTransform per-tuple reference count — pure internal state
# (hidden from table() reads and downstream transforms): refcount
# changes that don't cross 0↔1 must not emit deltas.
REF_COUNT = "_refCount"

SYSTEM_COLUMNS = {ENTRY_ID, SOURCE_ENTRY_ID, SOURCE_ENTRY_ID2, MATCHING_KEY,
                  AGGREGATED_COLUMN, SEQ, PARTITION_BUCKET, DEDUP_KEY,
                  GROUP_KEY, DISTINCT_KEY, REF_COUNT}
