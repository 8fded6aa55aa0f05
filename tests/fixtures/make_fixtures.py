"""Generate the frozen correctness fixtures (run once; outputs are
committed):

  semeval_mini.txt   — 40 sentences in the SemEval-2010 4-line format
  ddi_mini.xml       — DDI-shaped XML with entities/pairs (incl. a
                       ';'-split charOffset and an empty-type pair)
  expected_triples.json — reference predictions computed by the
                       pure-Python pipeline (refsem + numpy model),
                       the frozen comparison target for triple P/R.

Deterministic: seed 7, no wall-clock. Rerunning must be a no-op diff.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from deepref_spark import refsem, model as mdl  # noqa: E402
from deepref_spark.nlp import RuleTagger  # noqa: E402
from deepref_spark.portable import RELATION_NAMES  # noqa: E402

OUT = Path(__file__).resolve().parent

WORDS = ("the results from several experiments were reported during review "
         "and most common audits about waste recycling system design included "
         "new data for model training with large tables under heavy load").split()
ENTS = ["aspirin", "warfarin", "outline", "spirituality", "company", "river",
        "engine", "city", "archive", "violin"]
RELS = ["Other", "Cause-Effect(e1,e2)", "Component-Whole(e2,e1)",
        "Entity-Origin(e1,e2)", "Member-Collection(e1,e2)", "Message-Topic(e1,e2)"]


def make_semeval(n: int = 40) -> str:
    rng = np.random.RandomState(7)
    lines = []
    for i in range(1, n + 1):
        nw = int(rng.randint(6, 14))
        words = [WORDS[j] for j in rng.randint(0, len(WORDS), nw)]
        e1 = ENTS[int(rng.randint(0, len(ENTS)))]
        e2 = ENTS[int(rng.randint(0, len(ENTS)))]
        i1 = int(rng.randint(1, max(2, nw // 2)))
        i2 = int(rng.randint(i1 + 1, nw))
        toks = words[:i1] + [f"<e1>{e1}</e1>"] + words[i1:i2] + [f"<e2>{e2}</e2>"] + words[i2:]
        rel = RELS[int(rng.randint(0, len(RELS)))]
        lines.append(f'{i}\t"{" ".join(toks)}."')
        lines.append(rel)
        lines.append("Comment:")
        lines.append("")
    return "\n".join(lines) + "\n"


def make_ddi() -> str:
    rng = np.random.RandomState(7)
    sents = []
    for s in range(12):
        drug1 = ENTS[int(rng.randint(0, 5))]
        drug2 = ENTS[int(rng.randint(0, 5))]
        mid = " ".join(WORDS[j] for j in rng.randint(0, len(WORDS), 4))
        text = f"{drug1.capitalize()} {mid} {drug2} daily."
        o1 = (0, len(drug1) - 1)
        start2 = len(drug1) + 1 + len(mid) + 1
        o2 = (start2, start2 + len(drug2) - 1)
        rel = ["effect", "mechanism", "advise", "int", ""][int(rng.randint(0, 5))]
        pair = (
            f'    <pair id="d0.s{s}.p0" e1="d0.s{s}.e0" e2="d0.s{s}.e1" type="{rel}"/>'
        )
        # one sentence exercises the ';'-split two-range charOffset
        off1 = f"{o1[0]}-{o1[1]}" if s != 3 else f"{o1[0]}-{o1[1]};{o2[0]}-{o2[1]}"
        sents.append(f"""  <sentence id="d0.s{s}" text="{text}">
    <entity id="d0.s{s}.e0" charOffset="{off1}" type="drug" text="{drug1.capitalize()}"/>
    <entity id="d0.s{s}.e1" charOffset="{o2[0]}-{o2[1]}" type="drug" text="{drug2}"/>
{pair}
  </sentence>""")
    return '<?xml version="1.0" encoding="UTF-8"?>\n<document id="d0">\n' + "\n".join(sents) + "\n</document>\n"


def reference_predictions() -> list[dict]:
    """The pure-Python twin of the Spark pipeline: converter -> mention
    -> tokenize -> numpy forward -> triple. This is the 'reference
    prediction' fixture the Spark path must reproduce (P/R >= 0.95)."""
    tagger = RuleTagger()
    rel2id = {r: i for i, r in enumerate(sorted(set(RELATION_NAMES)))}
    weights = mdl.build_weights(len(rel2id))
    id2rel = {v: k for k, v in rel2id.items()}
    triples = []

    # SemEval side
    lines = make_semeval().splitlines()
    for i in range(0, len(lines), 4):
        tagged = refsem.tag_sentence_semeval(lines[i])
        m = refsem.build_mention(tagged, lines[i + 1].strip(), tagger)
        ids, mask, p1, p2 = refsem.bert_entity_tokenize(m.token, m.h["pos"], m.t["pos"], 128)
        pred, score = mdl.forward_batch(
            weights, np.array([ids]), np.array([mask]), np.array([p1]), np.array([p2])
        )
        triples.append({
            "corpus": "semeval_mini", "sent": i // 4,
            "subj": m.h["name"], "pred": id2rel[int(pred[0])], "obj": m.t["name"],
            "score": round(float(score[0]), 9),
        })

    # DDI side (via the XML scan semantics)
    from deepref_spark.sources.ddi_xml import _sentences_from_xml

    for k, (sid, pid, rel, tagged) in enumerate(_sentences_from_xml(make_ddi())):
        try:
            m = refsem.build_mention(tagged, rel, tagger)
        except (ValueError, IndexError):
            # offset-collision rows lose their pair markers (first-wins
            # position dict) — the reference's Sentence ctor would raise;
            # the pipeline drops them, so the fixture does too
            continue
        ids, mask, p1, p2 = refsem.bert_entity_tokenize(m.token, m.h["pos"], m.t["pos"], 128)
        pred, score = mdl.forward_batch(
            weights, np.array([ids]), np.array([mask]), np.array([p1]), np.array([p2])
        )
        triples.append({
            "corpus": "ddi_mini", "sent": sid,
            "subj": m.h["name"], "pred": id2rel[int(pred[0])], "obj": m.t["name"],
            "score": round(float(score[0]), 9),
        })
    return triples


if __name__ == "__main__":
    (OUT / "semeval_mini.txt").write_text(make_semeval())
    (OUT / "ddi_mini.xml").write_text(make_ddi())
    preds = reference_predictions()
    (OUT / "expected_triples.json").write_text(json.dumps(preds, indent=1))
    print(f"wrote {len(preds)} reference predictions")
