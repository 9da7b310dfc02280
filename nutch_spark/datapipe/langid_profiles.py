"""Trained character-trigram language-ID profiles (Cavnar & Trenkle 1994,
"N-Gram-Based Text Categorization" — public paper; same family as the
reference's language-identifier plugin, which ships per-language n-gram
profiles: /root/reference/src/plugin/language-identifier/src/java/org/
apache/nutch/analysis/lang/NGramProfile.java).

The model is a per-language character-trigram naive-Bayes scorer:

    score(doc, lang) = Σ_trigram  log P(trigram | lang)

with add-one smoothing over the union vocabulary and an out-of-vocabulary
penalty. Log-probabilities are scaled to INTEGERS (×1000, rounded) so that
document scores are exact integer sums — bit-identical across Spark, DuckDB
and any summation order, which keeps the operator oracle-certifiable under
STRICT_FLOATS.

Training data is a small embedded seed corpus per language (common public
phrases — enough to separate the five labels the testdata uses). Profiles
are built deterministically at import; both the Spark literal DataFrame and
the DuckDB VALUES table render from the same ``profile_rows()`` output, so
the two engines score with the exact same numbers.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from functools import lru_cache

# ~10 sentences of ordinary prose per language. Deliberately plain,
# high-frequency text: trigram statistics, not content, are the signal.
SEED_TEXT: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog. "
        "this is a simple sentence with some common english words. "
        "we are going to the market in the morning to buy bread and milk. "
        "there is nothing better than a good book on a rainy afternoon. "
        "the weather today is very nice and the children are playing outside. "
        "i would like to thank everyone for their help with this project. "
        "she said that the meeting will take place next week on thursday. "
        "people often forget how important it is to drink enough water. "
        "the history of the city goes back more than a thousand years. "
        "it was the best of times and it was the worst of times."
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund. "
        "dies ist ein einfacher satz mit einigen häufigen deutschen wörtern. "
        "wir gehen morgen früh auf den markt um brot und milch zu kaufen. "
        "es gibt nichts besseres als ein gutes buch an einem regnerischen nachmittag. "
        "das wetter ist heute sehr schön und die kinder spielen draußen. "
        "ich möchte mich bei allen für ihre hilfe bei diesem projekt bedanken. "
        "sie sagte dass die besprechung nächste woche am donnerstag stattfindet. "
        "die leute vergessen oft wie wichtig es ist genug wasser zu trinken. "
        "die geschichte der stadt reicht mehr als tausend jahre zurück. "
        "es war die beste zeit und es war die schlechteste zeit."
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux. "
        "ceci est une phrase simple avec quelques mots français courants. "
        "nous allons au marché demain matin pour acheter du pain et du lait. "
        "il n'y a rien de mieux qu'un bon livre un après-midi pluvieux. "
        "le temps est très beau aujourd'hui et les enfants jouent dehors. "
        "je voudrais remercier tout le monde pour son aide sur ce projet. "
        "elle a dit que la réunion aura lieu la semaine prochaine jeudi. "
        "les gens oublient souvent combien il est important de boire assez d'eau. "
        "l'histoire de la ville remonte à plus de mille ans. "
        "c'était le meilleur des temps et c'était le pire des temps."
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso. "
        "esta es una frase sencilla con algunas palabras comunes en español. "
        "vamos al mercado mañana por la mañana a comprar pan y leche. "
        "no hay nada mejor que un buen libro en una tarde lluviosa. "
        "el tiempo hoy es muy bueno y los niños están jugando afuera. "
        "quisiera agradecer a todos por su ayuda con este proyecto. "
        "ella dijo que la reunión tendrá lugar la próxima semana el jueves. "
        "la gente olvida a menudo lo importante que es beber suficiente agua. "
        "la historia de la ciudad se remonta a más de mil años. "
        "era el mejor de los tiempos y era el peor de los tiempos."
    ),
    "zh": (
        "敏捷的棕色狐狸跳过了懒惰的狗。"
        "这是一个包含一些常见中文词语的简单句子。"
        "我们明天早上去市场买面包和牛奶。"
        "没有什么比在雨天的下午读一本好书更好的了。"
        "今天天气很好孩子们在外面玩耍。"
        "我要感谢大家对这个项目的帮助。"
        "她说会议将在下周四举行。"
        "人们常常忘记喝足够的水有多重要。"
        "这座城市的历史可以追溯到一千多年前。"
        "这是最好的时代也是最坏的时代。"
    ),
    "it": (
        "la rapida volpe marrone salta sopra il cane pigro. "
        "questa è una frase semplice con alcune parole italiane comuni. "
        "andiamo al mercato domani mattina per comprare pane e latte. "
        "non c'è niente di meglio di un buon libro in un pomeriggio piovoso. "
        "oggi il tempo è molto bello e i bambini giocano fuori. "
        "vorrei ringraziare tutti per il loro aiuto con questo progetto. "
        "ha detto che la riunione si terrà la settimana prossima giovedì. "
        "la gente dimentica spesso quanto sia importante bere abbastanza acqua. "
        "la storia della città risale a più di mille anni fa. "
        "era il migliore dei tempi ed era il peggiore dei tempi."
    ),
    "pt": (
        "a rápida raposa marrom salta sobre o cão preguiçoso. "
        "esta é uma frase simples com algumas palavras comuns em português. "
        "vamos ao mercado amanhã de manhã comprar pão e leite. "
        "não há nada melhor do que um bom livro numa tarde chuvosa. "
        "o tempo hoje está muito bom e as crianças estão brincando lá fora. "
        "gostaria de agradecer a todos pela ajuda com este projeto. "
        "ela disse que a reunião acontecerá na próxima semana na quinta-feira. "
        "as pessoas esquecem muitas vezes como é importante beber bastante água. "
        "a história da cidade remonta a mais de mil anos. "
        "era o melhor dos tempos e era o pior dos tempos."
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond. "
        "dit is een eenvoudige zin met enkele veelvoorkomende nederlandse woorden. "
        "we gaan morgenochtend naar de markt om brood en melk te kopen. "
        "er is niets beters dan een goed boek op een regenachtige middag. "
        "het weer is vandaag erg mooi en de kinderen spelen buiten. "
        "ik wil iedereen bedanken voor hun hulp bij dit project. "
        "ze zei dat de vergadering volgende week donderdag zal plaatsvinden. "
        "mensen vergeten vaak hoe belangrijk het is om genoeg water te drinken. "
        "de geschiedenis van de stad gaat meer dan duizend jaar terug. "
        "het was de beste der tijden en het was de slechtste der tijden. "
        "wij zijn vrij om zelf te kiezen waar wij willen wonen. "
        "de jongens fietsen elke dag langs het kanaal naar hun werk. "
        "zij kijken graag naar oude schilderijen in het museum."
    ),
    "ru": (
        "быстрая коричневая лиса прыгает через ленивую собаку. "
        "это простое предложение с некоторыми распространенными русскими словами. "
        "завтра утром мы пойдем на рынок купить хлеб и молоко. "
        "нет ничего лучше хорошей книги дождливым днем. "
        "сегодня очень хорошая погода и дети играют на улице. "
        "я хотел бы поблагодарить всех за помощь в этом проекте. "
        "она сказала что встреча состоится на следующей неделе в четверг. "
        "люди часто забывают как важно пить достаточно воды. "
        "история города насчитывает более тысячи лет. "
        "это было лучшее из времен и это было худшее из времен."
    ),
    "ja": (
        "素早い茶色の狐は怠けた犬を飛び越える。"
        "これはよく使われる日本語の単語を含む簡単な文です。"
        "明日の朝パンと牛乳を買いに市場へ行きます。"
        "雨の午後に良い本を読むことほど良いものはありません。"
        "今日は天気がとても良くて子供たちは外で遊んでいます。"
        "このプロジェクトを手伝ってくれた皆さんに感謝します。"
        "彼女は会議が来週の木曜日に行われると言いました。"
        "人々は十分な水を飲むことの大切さをよく忘れます。"
        "この街の歴史は千年以上前にさかのぼります。"
        "それは最良の時代でもあり最悪の時代でもありました。"
    ),
    # round 8: the four reference test languages (language-identifier
    # plugin's da/el/fi/sv samples) the profile set was missing
    "da": (
        "den hurtige brune ræv springer over den dovne hund. "
        "dette er en enkel sætning med nogle almindelige danske ord. "
        "vi skal på markedet i morgen tidlig for at købe brød og mælk. "
        "der er ikke noget bedre end en god bog en regnfuld eftermiddag. "
        "vejret er meget godt i dag og børnene leger udenfor. "
        "jeg vil gerne takke alle for deres hjælp med dette projekt. "
        "hun sagde at mødet finder sted i næste uge om torsdagen. "
        "folk glemmer ofte hvor vigtigt det er at drikke nok vand. "
        "byens historie går mere end tusind år tilbage. "
        "det var den bedste tid og det var den værste tid."
    ),
    "sv": (
        "den snabba bruna räven hoppar över den lata hunden. "
        "detta är en enkel mening med några vanliga svenska ord. "
        "vi ska gå till marknaden i morgon bitti för att köpa bröd och mjölk. "
        "det finns inget bättre än en bra bok en regnig eftermiddag. "
        "vädret är mycket fint i dag och barnen leker utomhus. "
        "jag skulle vilja tacka alla för deras hjälp med detta projekt. "
        "hon sade att mötet kommer att äga rum nästa vecka på torsdagen. "
        "människor glömmer ofta hur viktigt det är att dricka tillräckligt med vatten. "
        "stadens historia går mer än tusen år tillbaka. "
        "det var den bästa av tider och det var den värsta av tider."
    ),
    "fi": (
        "nopea ruskea kettu hyppää laiskan koiran yli. "
        "tämä on yksinkertainen lause jossa on joitakin yleisiä suomalaisia sanoja. "
        "menemme huomenna aamulla torille ostamaan leipää ja maitoa. "
        "ei ole mitään parempaa kuin hyvä kirja sateisena iltapäivänä. "
        "sää on tänään erittäin kaunis ja lapset leikkivät ulkona. "
        "haluaisin kiittää kaikkia heidän avustaan tässä projektissa. "
        "hän sanoi että kokous pidetään ensi viikolla torstaina. "
        "ihmiset unohtavat usein kuinka tärkeää on juoda tarpeeksi vettä. "
        "kaupungin historia ulottuu yli tuhannen vuoden taakse. "
        "se oli parhainta aikaa ja se oli pahinta aikaa."
    ),
    "el": (
        "η γρήγορη καφέ αλεπού πηδάει πάνω από το τεμπέλικο σκυλί. "
        "αυτή είναι μια απλή πρόταση με μερικές συνηθισμένες ελληνικές λέξεις. "
        "θα πάμε στην αγορά αύριο το πρωί για να αγοράσουμε ψωμί και γάλα. "
        "δεν υπάρχει τίποτα καλύτερο από ένα καλό βιβλίο ένα βροχερό απόγευμα. "
        "ο καιρός σήμερα είναι πολύ καλός και τα παιδιά παίζουν έξω. "
        "θα ήθελα να ευχαριστήσω όλους για τη βοήθειά τους σε αυτό το έργο. "
        "είπε ότι η συνάντηση θα γίνει την επόμενη εβδομάδα την πέμπτη. "
        "οι άνθρωποι συχνά ξεχνούν πόσο σημαντικό είναι να πίνουν αρκετό νερό. "
        "η ιστορία της πόλης πηγαίνει πίσω περισσότερα από χίλια χρόνια. "
        "ήταν η καλύτερη εποχή και ήταν η χειρότερη εποχή."
    ),
}

TOP_N = 400  # trigrams kept per language profile (CT paper keeps ~300)
SCALE = 1000  # log-prob -> integer scale
PREFIX_CHARS = 400  # classify on this text prefix (langid-on-prefix standard)


def normalize(s: str) -> str:
    """Lowercase + collapse whitespace — MUST match the engine-side
    normalization (Spark/DuckDB ``regexp_replace(lower(...), '\\s+', ' ')``)."""
    return re.sub(r"\s+", " ", s.lower())


def _trigrams(s: str) -> list[str]:
    return [s[i : i + 3] for i in range(len(s) - 2)]


@lru_cache(maxsize=1)
def build_profiles() -> tuple[dict[str, dict[str, int]], dict[str, int]]:
    """Returns (profiles, miss): per-language trigram→int score maps and the
    out-of-vocabulary penalty, both scaled log-probs.

    The OOV penalty is UNIFORM across languages (smoothed against the
    LARGEST training total): with per-language penalties, the language with
    the smallest seed corpus wins every all-OOV document purely because its
    smoothing denominator is smallest — a training-set-size artifact, not a
    linguistic signal. A uniform miss makes unseen trigrams neutral and
    leaves discrimination to actual profile hits. (Kept per-language in the
    return shape so the scoring pipeline and oracle need no special case.)
    """
    counts = {lang: Counter(_trigrams(normalize(txt))) for lang, txt in SEED_TEXT.items()}
    vocab = set().union(*[set(c) for c in counts.values()])
    v = len(vocab)
    max_total = max(sum(c.values()) for c in counts.values())
    miss_score = round(math.log(1 / (max_total + v)) * SCALE)
    profiles: dict[str, dict[str, int]] = {}
    miss: dict[str, int] = {}
    for lang, c in counts.items():
        total = sum(c.values())
        top = dict(
            sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_N]
        )
        profiles[lang] = {
            tri: round(math.log((n + 1) / (total + v)) * SCALE)
            for tri, n in top.items()
        }
        miss[lang] = miss_score
    return profiles, miss


def profile_rows() -> list[tuple[str, str, int]]:
    """Flat (lang, trigram, score) rows — the single source both the Spark
    literal DataFrame and the DuckDB VALUES table render from."""
    profiles, _ = build_profiles()
    return [
        (lang, tri, score)
        for lang in sorted(profiles)
        for tri, score in sorted(profiles[lang].items())
    ]


def miss_rows() -> list[tuple[str, int]]:
    _, miss = build_profiles()
    return sorted(miss.items())


def profiles_values_sql() -> tuple[str, str]:
    """(profiles VALUES clause, miss VALUES clause) for the DuckDB oracle."""

    def esc(s: str) -> str:
        return s.replace("'", "''")

    p = ", ".join(
        f"('{esc(lang)}', '{esc(tri)}', {score})" for lang, tri, score in profile_rows()
    )
    m = ", ".join(f"('{esc(lang)}', {score})" for lang, score in miss_rows())
    return p, m
