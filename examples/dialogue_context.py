"""Dialogue context inheritance: pronoun-heavy turns stay findable.

Conversation turns rarely repeat their subject — "She loved it there" is
meaningless alone but perfectly clear after "Maya moved to Lisbon last
spring". Context-augmented lexical indexing (the build's largest quality
lever — BENCHMARKS.md "2-back context inheritance") folds each turn's
antecedent terms (1-back, weight 0.9), its grandparent's (2-back, 0.25,
via the persisted ctxprev chain), and — once — its successor's (0.6)
into the turn's BM25 doc at ingest. Queries about the SUBJECT then land
on the pronoun turns that actually carry the answer.

Turns chain per tag: give each conversation thread a stable tag (the
reference's session id plays the same role).
"""

from shodh_tpu.clients.client import Memory

with Memory(embedded=True, data_dir="/tmp/shodh-dialogue-example") as m:
    # one conversation thread — note turns 2-4 never say "Lisbon" or "Maya"
    thread = ["thread-42"]
    m.add("Maya moved to Lisbon last spring for the ocean-robotics lab",
          memory_type="conversation", tags=thread)
    m.add("She loved it there from the very first week",
          memory_type="conversation", tags=thread)
    m.add("The hardest part was shipping her workshop tools over",
          memory_type="conversation", tags=thread)
    m.add("Customs held the crate for a month before it cleared",
          memory_type="conversation", tags=thread)

    # the subject words live 1-3 turns away from the answers:
    for q in (
        "How did Maya like Lisbon?",            # answer is the pronoun turn
        "What happened to Maya's tools in Lisbon?",  # answer is 2-3 turns downstream
    ):
        hits = m.search(q, limit=2)
        print(f"\n{q}")
        for h in hits:
            print(f"   {h['score']:.3f}  {h['experience']['content']}")
