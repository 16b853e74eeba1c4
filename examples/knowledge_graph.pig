-- Knowledge-graph filtering over an entity-interaction triple store
-- built from the event log: plain BGP patterns, the TUPLIFY'd
-- (grouped) layout, and the r09 grouped-schema BGP specializations
-- (group-key predicate + statement-bag EXISTS + star join — no
-- re-explode; ref RDFRuleset.scala F4-F8/J2, SPARQling Pig BTW'15).
-- Run: python -m piglet_spark examples/knowledge_graph.pig \
--        -p sf=/root/testdata/sf0.001

EV = LOAD '$sf/events.parquet' USING ParquetStorage();

-- 1. triples: user --event_type--> event (one edge per interaction)
T = FOREACH EV GENERATE CONCAT('u', (chararray)user_id) AS subject,
    event_type AS predicate,
    CONCAT('e', (chararray)event_id) AS object;

-- 2. plain-schema BGP: every purchase edge (single-pattern filter,
--    stays (subject, predicate, object))
PUR = BGP_FILTER T BY { ?u 'purchase' ?e };

-- 3. grouped layout: one row per user carrying its statement bag —
--    the storage shape RDFLOAD ... GROUPED ON subject produces, and
--    the one that makes per-entity predicates partition-prunable
G = TUPLIFY T ON subject;

-- 4. grouped STAR join (J2): users with BOTH a click and a purchase
--    anywhere in their bag — two EXISTS over the bag, zero explodes
BUYERS = BGP_FILTER G BY { ?u 'click' ?a . ?u 'purchase' ?b };

-- 5. grouped single-pattern with a bound group key (F4/F7): one
--    user's click edges — a key predicate plus a bag EXISTS
U1 = BGP_FILTER G BY { 'u1' 'click' ?e };

-- 6. funnel-ish report off the grouped survivors
N = FOREACH BUYERS GENERATE subject AS user, COUNT(stmts) AS n_edges;
R = ORDER N BY n_edges DESC;
L = LIMIT R 10;
DUMP L;
