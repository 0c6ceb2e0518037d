#!/usr/bin/env python3
"""Author fixtures/golden_turns.json (JSONL).

Every expectation in this file is HAND-DERIVED from the pinned rule spec
(core/RuleSpec.scala thresholds, core/Scrub.scala regex chain, SURVEY.md
S3.3) -- NOT computed by running core.* -- so the golden suite can catch a
semantic bug in a shared scalar that the oracle-vs-pipeline F1 cannot see.
Two long texts (g06, g07) are mechanically constructed (distinct letter
words / a 676-cycle of two-letter words) because nobody types 8000 chars by
hand; their expected rule outcomes are still hand-reasoned and written as
has/not sets.

Expectation fields per row (null = not checked):
  exp_hits      exact sorted rule_hits
  exp_hits_has  must be a subset of actual rule_hits
  exp_hits_not  must not intersect actual rule_hits
  exp_scrub     exact scrubbed_text
  exp_lang      exact lang label
  exp_ppl_lt / exp_ppl_ge   ppl bound
"""
import json

rows = []


def turn(conv, idx, role, text, tool=None, ts_off=None, hits=None, has=None,
         not_=None, scrub=None, lang=None, ppl_lt=None, ppl_ge=None, note=""):
    rows.append({
        "conv_id": conv, "turn_idx": idx, "role": role, "text": text,
        "tool": tool, "ts_off": ts_off if ts_off is not None else 0,
        "exp_hits": hits, "exp_hits_has": has, "exp_hits_not": not_,
        "exp_scrub": scrub, "exp_lang": lang,
        "exp_ppl_lt": ppl_lt, "exp_ppl_ge": ppl_ge, "note": note})


# ---- length / words / repetition / ratio rules (hand-counted cp & words) --
turn("g01", 0, "user", None, hits=["r_null", "r_short", "r_words"], scrub="",
     note="null text normalizes to empty: cp=0<2, words=0<1")
turn("g02", 0, "user", "", hits=["r_short", "r_words"], scrub="",
     note="empty: cp=0, words=0; r_null needs literal null")
turn("g03", 0, "user", "x", hits=["r_short"], scrub="x", note="cp=1<2")
turn("g04", 0, "user", "ok", hits=[], scrub="ok", note="cp=2 boundary: kept")
turn("g05", 0, "user", "no way", hits=[], scrub="no way")

# g06: 615 distinct 13-letter words = 615*13+614 = 8609 cp > 8000 -> r_long;
# all bigrams distinct -> no r_rep; 615 words <= 2000 -> no r_words;
# lang/ppl model outcomes not hand-derivable for letter noise -> has/not only
LETTERS = "abcdefghijklmnopqrstuvwxyz"


def word13(i):
    w = []
    v = i * 48271 % (26 ** 13)
    for _ in range(13):
        w.append(LETTERS[v % 26])
        v //= 26
    return "".join(w)


long_words = [word13(i) for i in range(615)]
assert len(set(long_words)) == 615
turn("g06", 0, "user", " ".join(long_words),
     has=["r_long"], not_=["r_rep", "r_short", "r_sym", "r_digit", "r_words"],
     scrub=" ".join(long_words),
     note="8609 cp > 8000; 615 distinct words; letters only")

# g07: 2100 two-letter words cycling a 676-word alphabet: cp = 2100*2+2099 =
# 6299 < 8000; nWords = 2100 > 2000 -> r_words; distinct bigrams = 676 of
# 2099 -> repRatio = 1-676/2099 = 0.678 > 0.5 -> r_rep
two = [a + b for a in LETTERS for b in LETTERS]
many = [two[i % 676] for i in range(2100)]
turn("g07", 0, "user", " ".join(many),
     has=["r_rep", "r_words"], not_=["r_digit", "r_long", "r_short", "r_sym"],
     scrub=" ".join(many),
     note="2100 words > 2000; cycle => rep ratio 0.678 > 0.5")

turn("g08", 0, "user", "the and the and the and the and the",
     hits=["r_rep"], lang="en", ppl_lt=1000.0,
     scrub="the and the and the and the and the",
     note="9 words, 8 bigrams, 2 distinct -> rep 0.75; top-2 en corpus words")
turn("g09", 0, "user", "the and for with that this from have are was",
     hits=[], lang="en", ppl_lt=1000.0,
     scrub="the and for with that this from have are was",
     note="10 distinct en words -> rep 0, all rules green")
turn("g10", 0, "user", "ok >>> ### $$$ !!!", hits=["r_sym"],
     scrub="ok >>> ### $$$ !!!",
     note="cp=18 (<20: no lang), 12 symbols/18 = 0.667 > 0.30")
turn("g11", 0, "user", "abcdef !!!", hits=[], scrub="abcdef !!!",
     note="cp=10, 3 symbols -> exactly 0.30, boundary NOT a violation")
turn("g12", 0, "user", "n 8472 9365 1047", hits=["r_digit"],
     scrub="n <PHONE>",
     note="cp=16, 12 digits = 0.75 > 0.5; spaced 14-char digit run is a "
          "PHONE match (12 digits < CC's 13 minimum)")
turn("g13", 0, "user", "12345abcde", hits=[], scrub="12345abcde",
     note="cp=10, 5 digits -> exactly 0.50, boundary NOT a violation")

# ---- role / tool rules ----
turn("g14", 0, "narrator", "fine here", hits=["r_role"], scrub="fine here")
turn("g15", 0, None, "fine here", hits=["r_role"], scrub="fine here",
     note="null role out of domain")
turn("g16", 0, "tool", "done", hits=["r_tool"], scrub="done",
     note="tool role with null tool name")
turn("g17", 0, "tool", "done", tool="search", hits=[], scrub="done")
turn("g18", 0, "system", "be concise", hits=[], scrub="be concise")
turn("g50", 0, "tool", "done", tool="", hits=["r_tool"], scrub="done",
     note="empty-string tool name is as bad as null")
turn("g51", 0, "assistant", "sure thing", hits=[], scrub="sure thing",
     note="assistant first: r_alt has no previous turn to clash with")

# ---- window rules: order / alternation (multi-turn convs) ----
turn("g19", 0, "user", "hello there", ts_off=0, hits=[], scrub="hello there")
turn("g19", 1, "assistant", "hi", ts_off=60, hits=[], scrub="hi")
turn("g19", 3, "user", "still there", ts_off=120, hits=["r_order"],
     scrub="still there", note="idx gap 1->3")
turn("g20", 1, "user", "first turn missing", hits=["r_order"],
     scrub="first turn missing", note="rn=1 must have turn_idx 0")
turn("g21", 0, "user", "hello friend", ts_off=0, hits=[], scrub="hello friend")
turn("g21", 1, "user", "are you there", ts_off=60, hits=["r_alt"],
     scrub="are you there", note="user after user")
turn("g22", 0, "user", "hi there", ts_off=0, hits=[], scrub="hi there")
turn("g22", 1, "assistant", "hello back", ts_off=60, hits=[],
     scrub="hello back")
turn("g22", 2, "assistant", "more text", ts_off=120, hits=["r_alt"],
     scrub="more text", note="assistant after assistant")
turn("g23", 0, "user", "run this", ts_off=0, hits=[], scrub="run this")
turn("g23", 1, "tool", "done", tool="code", ts_off=60, hits=[], scrub="done")
turn("g23", 2, "user", "thanks a lot", ts_off=120, hits=[],
     scrub="thanks a lot",
     note="pinned semantics: tool between user turns breaks alternation "
          "adjacency, so no r_alt")
turn("g24", 0, "user", "one two", ts_off=0, hits=[], scrub="one two")
turn("g24", 0, "assistant", "three four", ts_off=60, hits=["r_order"],
     scrub="three four",
     note="duplicate idx: ts tiebreak orders it second; prev 0 +1 != 0")
# file order intentionally reversed; stable window must re-sort
turn("g25", 1, "user", "two words", ts_off=60, hits=[], scrub="two words")
turn("g25", 0, "assistant", "first msg", ts_off=0, hits=[], scrub="first msg")
turn("g49", 5, "narrator", None,
     hits=["r_null", "r_order", "r_role", "r_short", "r_words"], scrub="",
     note="everything wrong at once; sorted hit list pinned")

# ---- scrub chain goldens (regex semantics, chain ORDER, boundaries) ----
turn("g26", 0, "user", "contact alice.b@example.com now",
     not_=["r_sym", "r_digit", "r_short", "r_long", "r_words", "r_rep"],
     scrub="contact <EMAIL> now")
turn("g27", 0, "user", "mail me: bob_smith+tag@sub.domain.co.uk!",
     scrub="mail me: <EMAIL>!",
     note="local part with _ + tag; multi-label domain swallowed greedily")
turn("g28", 0, "user", "ssn 123-45-6789 ok", not_=["r_digit", "r_sym"],
     scrub="ssn <SSN> ok",
     note="SSN step runs BEFORE phone; 9 digits/18 cp = 0.5 boundary")
turn("g29", 0, "user", "card 4111 1111 1111 1111 now",
     scrub="card <CC> now", note="16 spaced digits -> CC, not phone (order)")
turn("g30", 0, "user", "4111111111111111", hits=["r_digit"], scrub="<CC>",
     note="16/16 digits -> r_digit; unspaced 16-run is CC")
turn("g31", 0, "user", "call +1 415-555-0133 today",
     scrub="call <PHONE> today")
turn("g32", 0, "user", "host 203.0.113.42 down", scrub="host <IP> down",
     note="dots keep phone/CC from matching; IP step still sees it")
turn("g33", 0, "user", "that is badword1 really",
     scrub="that is <TOX> really")
turn("g34", 0, "user", "say SLUR2 loud", scrub="say <TOX> loud",
     note="toxicity list is case-insensitive")
turn("g35", 0, "user", "badword12 stays", scrub="badword12 stays",
     note="word boundary: badword12 is NOT badword1")
turn("g36", 0, "user", "badword1@example.com here", scrub="<EMAIL> here",
     note="chain order: email step consumes the tox word first")
turn("g37", 0, "user", "a@b.co and c@d.io", scrub="<EMAIL> and <EMAIL>")
turn("g38", 0, "user", "alice.b@example.com 123-45-6789",
     scrub="<EMAIL> <SSN>")
turn("g39", 0, "user", "1234567 short", hits=["r_digit"],
     scrub="1234567 short",
     note="7 digits/13 cp = 0.538 > 0.5; 7-digit run is below phone minimum")
turn("g40", 0, "user", "v1.2.3.4 release", not_=["r_digit", "r_sym"],
     scrub="v1.2.3.4 release",
     note="no word boundary inside v1 -> IP regex cannot anchor")
turn("g52", 0, "user", "call 4155550133 now", hits=["r_digit"],
     scrub="call <PHONE> now",
     note="10/19 cp digits = 0.526 > 0.5; bare 10-digit run is a phone")
turn("g53", 0, "user", "12-345-6789", scrub="<PHONE>",
     note="wrong SSN grouping falls through to the phone step")

# ---- language-ID / perplexity (directional: texts are drawn from the
# pinned per-language seed vocabularies, so the byte-ngram model must get
# these right by construction) ----
turn("g41", 0, "user",
     "please check the result and write the answer because people want "
     "good data from this system about work time question number value",
     hits=[], lang="en", ppl_lt=1000.0,
     scrub="please check the result and write the answer because people "
           "want good data from this system about work time question "
           "number value",
     note="22 en-vocab words, distinct bigrams")
turn("g42", 0, "user",
     "der die das und ist nicht mit ein eine auch auf aber wenn wir sie "
     "ich haben werden kann nach",
     hits=["r_lang"], lang="de", ppl_lt=1000.0,
     scrub="der die das und ist nicht mit ein eine auch auf aber wenn wir "
           "sie ich haben werden kann nach",
     note="de text >= 20 cp: lang gate fires, ppl stays low (trained lang)")
turn("g43", 0, "user",
     "le la les des une est pas que qui dans pour avec sur sont mais nous "
     "vous être avoir faire très",
     hits=["r_lang"], lang="fr", ppl_lt=1000.0,
     scrub="le la les des une est pas que qui dans pour avec sur sont "
           "mais nous vous être avoir faire très")
turn("g44", 0, "user",
     "el los las una que con por para como pero este esta ser estar hacer "
     "tener poder decir todo también",
     hits=["r_lang"], lang="es", ppl_lt=1000.0,
     scrub="el los las una que con por para como pero este esta ser estar "
           "hacer tener poder decir todo también")
turn("g45", 0, "user", "的 是 不 了 在 人 有 我 他 这 中 大 来 上 国 个 到 说 们 为",
     hits=["r_lang"], lang="zh", ppl_lt=1000.0,
     scrub="的 是 不 了 在 人 有 我 他 这 中 大 来 上 国 个 到 说 们 为",
     note="39 cp incl spaces")
turn("g46", 0, "user", "жф щш чъ ыэ юя ђљ", hits=["r_ppl"], ppl_ge=1000.0,
     scrub="жф щш чъ ыэ юя ђљ",
     note="17 cp < 20 (no lang gate); 6 words >= 5; bytes unseen by the LM")
turn("g47", 0, "user", "good data", hits=[], scrub="good data",
     note="cp=9 < 10: ratio rules do not apply")
turn("g48", 0, "user",
     "please send the answer to alice.b@example.com and check the value",
     hits=[], lang="en",
     scrub="please send the answer to <EMAIL> and check the value",
     note="clean en turn with PII: kept AND scrubbed")

with open("/root/repo/fixtures/golden_turns.json", "w") as f:
    for r in rows:
        f.write(json.dumps(r, ensure_ascii=False) + "\n")
print(f"wrote {len(rows)} golden turns")
