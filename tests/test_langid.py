"""Trained char-trigram language ID (round-4 item 6).

Accuracy is asserted on HELD-OUT real sentences (none appear in the seed
corpora in datapipe/langid_profiles.py). The synthetic documents table
cannot test accuracy — its ``lang`` label is independent of its text (all
31 vocabulary tokens occur in all 5 languages), so the oracle row
``dp_langid`` checks cross-engine determinism and these tests check that
the classifier actually classifies.
"""

from __future__ import annotations

import pytest

from nutch_spark.datapipe.langid_profiles import (
    SEED_TEXT,
    build_profiles,
    normalize,
    profile_rows,
)
from nutch_spark.datapipe.textstats import langid_trained

HELD_OUT = [
    ("Il treno per Milano parte domani alle otto del mattino.", "it"),
    ("I ristoranti del centro sono sempre pieni durante il fine settimana.", "it"),
    ("O museu da cidade abre todos os dias menos segunda-feira.", "pt"),
    ("Meus avós moram numa pequena aldeia perto da montanha.", "pt"),
    ("Het meisje schrijft elke week een brief aan haar vriendin.", "nl"),
    ("De studenten bereiden hun examens voor in de bibliotheek.", "nl"),
    ("Студенты готовятся к экзаменам в университетской библиотеке.", "ru"),
    ("Вчера вечером мы с друзьями ужинали в ресторане.", "ru"),
    ("図書館で学生たちが期末試験の準備をしています。", "ja"),
    ("昨日の夜友達とレストランで夕食を食べました。", "ja"),
    ("The results of the experiment were published in a scientific journal.", "en"),
    ("Many people enjoy walking along the river in the early evening.", "en"),
    ("Die Kinder lernen in der Schule lesen schreiben und rechnen.", "de"),
    ("Der Zug nach München fährt heute leider eine Stunde später ab.", "de"),
    ("Le gouvernement a annoncé une nouvelle réforme des retraites hier soir.", "fr"),
    ("Nous avons passé nos vacances au bord de la mer avec nos amis.", "fr"),
    ("El museo de la ciudad abre sus puertas todos los días excepto lunes.", "es"),
    ("Mis abuelos viven en un pequeño pueblo cerca de la montaña.", "es"),
    ("我们学校的老师每天都认真地给学生们上课。", "zh"),
    ("昨天晚上我和朋友一起去餐厅吃了晚饭。", "zh"),
    # round 8 additions (da/sv/fi/el)
    ("Eleverne forbereder deres eksamener på skolens bibliotek.", "da"),
    ("Vi spiste aftensmad sammen med vores venner i går aftes.", "da"),
    ("Studenterna förbereder sina tentor i universitetets bibliotek.", "sv"),
    ("Vi åt middag tillsammans med våra vänner i går kväll.", "sv"),
    ("Opiskelijat valmistautuvat tentteihin yliopiston kirjastossa.", "fi"),
    ("Söimme eilen illalla päivällistä ystäviemme kanssa ravintolassa.", "fi"),
    ("Οι φοιτητές προετοιμάζονται για τις εξετάσεις στη βιβλιοθήκη.", "el"),
    ("Χθες το βράδυ φάγαμε δείπνο με τους φίλους μας σε ένα εστιατόριο.", "el"),
    # round 14 additions (pl/cs/no/hu/ro/tr)
    ("Uczniowie przygotowują się do egzaminów w szkolnej bibliotece.", "pl"),
    ("Wczoraj wieczorem zjedliśmy kolację z przyjaciółmi w restauracji.", "pl"),
    ("Studenti se připravují na zkoušky v univerzitní knihovně.", "cs"),
    ("Včera večer jsme s přáteli večeřeli v restauraci.", "cs"),
    ("Studentene forbereder seg til eksamen på biblioteket i Oslo.", "no"),
    ("I går kveld spiste vi middag sammen med venner på en restaurant.", "no"),
    ("A diákok a könyvtárban készülnek a vizsgáikra minden délután.", "hu"),
    ("Tegnap este a barátaimmal vacsoráztunk egy étteremben.", "hu"),
    ("Studenții se pregătesc pentru examene în biblioteca universității.", "ro"),
    ("Aseară am luat cina cu prietenii la un restaurant din oraș.", "ro"),
    ("Öğrenciler kütüphanede sınavlarına hazırlanıyor her akşam.", "tr"),
    ("Dün akşam arkadaşlarımla restoranda yemek yedik.", "tr"),
]


def test_profiles_deterministic_and_disjoint():
    p1, m1 = build_profiles()
    p2, m2 = build_profiles.__wrapped__()  # rebuild without the cache
    assert p1 == p2 and m1 == m2
    assert set(p1) == set(SEED_TEXT)
    # 5 testdata labels + it/pt/nl/ru/ja + r8 da/sv/fi/el + r14 pl/cs/no/hu/ro/tr
    assert len(p1) == 20
    for lang, prof in p1.items():
        assert 0 < len(prof) <= 400
        assert all(isinstance(v, int) and v < 0 for v in prof.values())
        assert m1[lang] < min(prof.values())  # OOV scores below every hit


def test_profile_rows_sorted_stable():
    rows = profile_rows()
    assert rows == sorted(rows)
    assert {r[0] for r in rows} == set(SEED_TEXT)


def test_held_out_accuracy(spark):
    df = spark.createDataFrame(
        [(i, s, l) for i, (s, l) in enumerate(HELD_OUT)],
        "doc_id long, text string, lang string",
    )
    out = langid_trained(df).select("lang", "lang_pred").collect()
    correct = sum(1 for r in out if r["lang"] == r["lang_pred"])
    assert correct == len(HELD_OUT), [
        (r["lang"], r["lang_pred"]) for r in out if r["lang"] != r["lang_pred"]
    ]


def test_short_text_is_und(spark):
    df = spark.createDataFrame(
        [(1, "ab", "x"), (2, "", "x"), (3, None, "x")],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r["lang_pred"] for r in langid_trained(df).collect()}
    assert out[1] == "und" and out[2] == "und"
    # NULL text: normalization yields NULL -> n_tri 0 via length(NULL);
    # prediction must not crash and must not claim a language
    assert out[3] in ("und", None)


def test_normalize_matches_engine_semantics():
    assert normalize("A  B\t\nC") == "a b c"
