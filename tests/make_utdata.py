"""Generate the deterministic synthetic fixture corpus in tests/utdata/.

50 factoid queries over a 1000-doc mini-world. Each query's answer appears
verbatim in exactly one "gold" passage; the rest are lexically-related
distractors, so retrieval quality is measurable (qrels written alongside) and
the Match metric is meaningful without any network access. Run once; the TSVs
are committed.
"""

import json
import os
import random

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "utdata")

ENTITIES = [
    "Avaria", "Borundi", "Cestia", "Drovak", "Elmora", "Fenwick", "Gorlan",
    "Hastia", "Ithaca", "Jorvia", "Kelmor", "Lustra", "Morvane", "Nerith",
    "Opalia", "Prenor", "Quellon", "Rostam", "Sylvane", "Tormund", "Umbria",
    "Velcor", "Wrenfall", "Xanthe", "Yorvik", "Zephyra", "Aldoria", "Brint",
    "Corvalis", "Dunmere", "Eskel", "Farrow", "Gillern", "Hollowmere",
    "Iskarn", "Jundal", "Kressley", "Lomond", "Marrowick", "Nimbria",
    "Ostrevant", "Pellam", "Quorrin", "Ravelin", "Starn", "Thessaly",
    "Uldwyn", "Varrock", "Windmoor", "Ystrad",
]
CAPITALS = [
    "Ashford", "Blackwell", "Caldera", "Dremel", "Everton", "Finsbury",
    "Graymoor", "Highgate", "Ironbridge", "Jasperton", "Kingsmere",
    "Larkspur", "Millbrook", "Northome", "Oakhurst", "Pinecrest",
    "Quarrytown", "Redfern", "Silverton", "Thornbury", "Umberton",
    "Vantage", "Westcliff", "Xaviera", "Yellowfield", "Zedmont",
    "Amberline", "Bricklow", "Copperhill", "Dustwick", "Elmsworth",
    "Foxden", "Glenhaven", "Harrowgate", "Ivorydale", "Junction",
    "Kestrelwood", "Lindenford", "Mistvale", "Nettlesham", "Orchardton",
    "Palegrove", "Quillford", "Rushmere", "Stonebridge", "Tarnwick",
    "Underbough", "Violetfield", "Willowmere", "Yarrowfen",
]

FILLER_TOPICS = [
    "river", "mountain range", "railway", "festival", "university", "harbor",
    "forest", "museum", "observatory", "cathedral", "market", "lighthouse",
]


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = random.Random(1234)

    queries, docs, qrel = [], [], {}
    for i, (country, capital) in enumerate(zip(ENTITIES, CAPITALS)):
        qid = f"q{i}"
        did = f"d_gold_{i}"
        queries.append((qid, f"What is the capital of {country}?", capital))
        docs.append(
            (
                did,
                f"{country} is a small nation known for its {rng.choice(FILLER_TOPICS)}. "
                f"The capital of {country} is {capital}, which lies on the "
                f"{rng.choice(CAPITALS)} plain and hosts the national archive.",
            )
        )
        qrel[qid] = {did: 1}

    # distractor docs: mention entities without the answer fact
    n_distractors = 950
    for j in range(n_distractors):
        country = rng.choice(ENTITIES)
        other = rng.choice(ENTITIES)
        topic = rng.choice(FILLER_TOPICS)
        docs.append(
            (
                f"d_noise_{j}",
                f"The {topic} of {country} was restored in {1800 + rng.randrange(200)}. "
                f"Travellers from {other} often visit the {rng.choice(FILLER_TOPICS)} "
                f"district during the spring fair.",
            )
        )
    rng.shuffle(docs)

    with open(os.path.join(OUT, "ut1_queries.tsv"), "w") as f:
        for i, (qid, q, a) in enumerate(queries):
            f.write(f"{qid}\t{q}\t{a}\td_gold_{i}\n")
    with open(os.path.join(OUT, "ut1_docs.tsv"), "w") as f:
        for did, text in docs:
            f.write(f"{did}\t{text}\n")
    with open(os.path.join(OUT, "qrel.ut1queries.dev.json"), "w") as f:
        json.dump(qrel, f, indent=1)
    print(f"wrote {len(queries)} queries / {len(docs)} docs to {OUT}")


if __name__ == "__main__":
    main()
