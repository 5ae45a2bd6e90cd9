"""Informal text just works: slang, misspellings, contractions, typos.

Real users write "gonna watch my fave movie" and later search for
"favorite film"; they typo "recieved" and still expect the package memory
back. The lexical canonicalization stack (irregular-lemma folds, spelling
norm folds, OOV spell correction — BENCHMARKS.md "lexical canonicalization
campaign") makes those queries meet in the middle with no trained
embedder involved.
"""

from shodh_tpu.clients.client import Memory

with Memory(embedded=True, data_dir="/tmp/shodh-informal-example") as m:
    # informal, as actually typed
    m.add("We're gonna watch my fave movie at the theatre tonite",
          memory_type="conversation", tags=["plans"])
    m.add("Finally recieved the package — the colour is perfect",
          memory_type="conversation", tags=["delivery"])
    m.add("She went to the dentist and the kids went to their grandma's",
          memory_type="conversation", tags=["family"])

    # formal queries still land on the informal memories:
    for q in (
        "What is their favorite movie?",          # fave -> favorite
        "Was the package received? What color?",  # recieved/colour heal
        "Where did she go?",                      # went -> go (lemma fold)
    ):
        print(f"\nRecall: {q}")
        for hit in m.search(q, limit=2):
            print(f"  {hit['score']:.3f}  {hit['experience']['content']}")
