"""KG layers beyond the reference (north-star additions, SURVEY.md §7.1
step 6): entity linking against a broadcast alias dictionary and
canonicalization via distributed connected components.

* ``link_mentions``: mentions ⋈ alias dict on the lowercase lemma-joined
  surface. The dictionary is small by construction (<= millions of rows at
  worst) -> explicit ``F.broadcast``; the join is map-side, no shuffle of
  the mention table.
* ``connected_components``: iterative min-label propagation over
  bidirectional edges with ``localCheckpoint`` every iteration (lineage
  truncation) and AQE handling skew. Convergence is O(diameter) rounds;
  KG canonicalization graphs are stars around alias nodes plus short
  within-document chains, so 2-4 rounds in practice. Each round is one
  shuffle on the vertex id. (For adversarial long-chain graphs the
  large-star/small-star variant bounds rounds at O(log n); the propagation
  loop is the right trade for this graph shape.)
* ``canonical_edges``: builds the edge list from extraction outputs:
  coreference (G3), rule IDENTITY/SIMULTANEOUS pairs, and alias matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_mentions(mentions: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """mentions(url, mention_id, kind, lemma, ...) ⋈ alias(alias, kind,
    canonical_id) -> linked mentions (left join; unlinked rows keep
    canonical_id null)."""
    m = mentions.withColumn("alias_key", F.lower(F.col("lemma")))
    a = alias_dict.select(F.col("alias").alias("alias_key"),
                          F.col("kind").alias("alias_kind"),
                          "canonical_id")
    return (m.join(F.broadcast(a),
                   (m.alias_key == a.alias_key) & (m.kind == a.alias_kind),
                   "left")
            .drop("alias_key", "alias_kind"))


def connected_components(edges: DataFrame, max_iterations: int = 25,
                         src: str = "src", dst: str = "dst",
                         stats: dict | None = None) -> DataFrame:
    """edges(src, dst) -> (vertex, component) with component = min vertex
    id (string order) in the component. ``stats`` (optional dict) gets
    ``rounds`` = iterations run until convergence."""
    # checkpoint the edge list FIRST: vertices/labels are derived from it,
    # so deriving them pre-checkpoint would re-execute the (expensive)
    # upstream extraction once more per derived frame
    both = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .unionByName(edges.select(F.col(dst).alias("a"),
                                      F.col(src).alias("b"))))
    both = both.localCheckpoint()
    labels = (both.select(F.col("a").alias("vertex")).distinct()
              .withColumn("component", F.col("vertex"))
              .localCheckpoint())

    for it in range(max_iterations):
        if stats is not None:
            stats["rounds"] = it + 1
        # 1-hop: pull the neighbour's current component.
        neighbor = (both.join(labels, both.b == labels.vertex)
                    .select(F.col("a").alias("vertex"),
                            F.col("component")))
        hop = (labels.unionByName(neighbor)
               .groupBy("vertex")
               .agg(F.min("component").alias("component")))
        # pointer jump: component(v) <- component(component(v)); component
        # ids are themselves vertex ids, so this doubles resolved chain
        # depth and bounds convergence at O(log diameter) rounds. ``hop``
        # is deliberately NOT checkpointed: its aggregation feeds both
        # sides of the self-join through the SAME Exchange, which Spark's
        # ReuseExchange dedupes - one execution, no extra materialization.
        # (Checkpointing every intermediate per round piled up block-
        # manager state that ballooned driver-side per-action overhead
        # ~4x/round in late rounds - 25s -> 9s total on a 5k chain,
        # timeout -> 70s on a 1M-edge chain+hub graph after removing it.)
        jump = (hop.alias("l")
                .join(hop.alias("r"),
                      F.col("l.component") == F.col("r.vertex"), "left")
                .select(F.col("l.vertex").alias("vertex"),
                        F.least(F.col("l.component"),
                                F.coalesce(F.col("r.component"),
                                           F.col("l.component")))
                        .alias("component")))
        # ONE checkpoint per round (lineage truncation point); the old
        # component rides along so the convergence check is a scan of
        # the checkpoint, not a fresh join.
        new_labels = (jump
                      .join(labels.withColumnRenamed("component", "old"),
                            "vertex")
                      .localCheckpoint())
        changed = (new_labels
                   .filter(F.col("component") != F.col("old"))
                   .limit(1).count())
        labels = new_labels.drop("old")
        if changed == 0:
            break
    return labels


def canonical_edges(linked_mentions: DataFrame,
                    triples: DataFrame) -> DataFrame:
    """Edge list for canonicalization:
    * mention -> alias canonical id (cross-document identity),
    * same-document SIMULTANEOUS/IDENTITY triple endpoints.
    Vertex ids are globally scoped as '<url>#<mention_id>'; alias nodes as
    'alias:<canonical_id>' (lexicographically smallest, so they become the
    component representatives)."""
    scoped = F.concat_ws("#", "url", "mention_id")
    alias_edges = (linked_mentions
                   .filter(F.col("canonical_id").isNotNull())
                   .select(scoped.alias("src"),
                           F.concat(F.lit("alias:"),
                                    F.col("canonical_id")).alias("dst")))
    sim_edges = (triples
                 .filter(F.col("pred").isin("SIMULTANEOUS", "IDENTITY"))
                 .select(F.concat_ws("#", "url", "subj").alias("src"),
                         F.concat_ws("#", "url", "obj").alias("dst")))
    return alias_edges.unionByName(sim_edges)


def canonicalize(linked_mentions: DataFrame, triples: DataFrame,
                 max_iterations: int = 25) -> DataFrame:
    """(vertex, component): canonical cluster id per mention node."""
    return connected_components(canonical_edges(linked_mentions, triples),
                                max_iterations)


def cc_incremental(labels: DataFrame, delta_edges: DataFrame,
                   src: str = "src", dst: str = "dst",
                   stats: dict | None = None) -> DataFrame:
    """Incremental connected components: refresh (vertex, component)
    labels with a batch of NEW edges without re-running CC over the
    base edge set - the graph analogue of ops/maintenance.py's
    ivm_refresh, and the shape an entity-resolution/canonicalization
    pipeline needs at 100 TB, where the mention graph grows by a crawl
    batch a day and the base has 10^11 edges.

    Contract-and-solve: map each delta endpoint through its old label
    (unknown vertices keep themselves), run :func:`connected_components`
    on the CONTRACTED delta graph - whose size is bounded by the delta,
    never the base - then compose: every old label is rewritten through
    the contracted solution. Exactness: an old component's label IS its
    min member, so min over merged label-vertices equals min over the
    merged membership - the composed labels are bit-identical to a full
    CC over base UNION delta (the driver oracle asserts exactly that
    equivalence, via an independent recursive-closure formulation).

    Insert-only, like every self-maintainable aggregate: deleting an
    edge can split a component, which needs a base re-scan by nature.
    """
    e = delta_edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    ls = labels.select(F.col("vertex").alias("s"),
                       F.col("component").alias("s_c"))
    ld = labels.select(F.col("vertex").alias("d"),
                       F.col("component").alias("d_c"))
    contracted = (e.join(ls, "s", "left").join(ld, "d", "left")
                  .select(F.coalesce("s_c", F.col("s")).alias("src"),
                          F.coalesce("d_c", F.col("d")).alias("dst")))
    sub = connected_components(contracted, stats=stats) \
        .withColumnRenamed("vertex", "old_component") \
        .withColumnRenamed("component", "new_component")
    # old vertices: rewrite their label through the contracted solution
    updated = (labels.join(sub, labels.component == sub.old_component,
                           "left")
               .select("vertex",
                       F.coalesce("new_component", "component")
                       .alias("component")))
    # vertices born in the delta: their contracted id is themselves
    known = labels.select(F.col("vertex").alias("v"))
    fresh = (e.select(F.col("s").alias("v"))
             .unionByName(e.select(F.col("d").alias("v")))
             .distinct()
             .join(known, "v", "left_anti")
             .join(sub, F.col("v") == sub.old_component, "left")
             .select(F.col("v").alias("vertex"),
                     F.coalesce("new_component", F.col("v"))
                     .alias("component")))
    return updated.unionByName(fresh)
