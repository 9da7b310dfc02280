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
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "the students read many books at the city library every week. in the evening the family eats dinner together in the kitchen. she prepares carefully for her exams."
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
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "die schüler lesen jede woche viele bücher in der stadtbibliothek. am abend isst die familie gemeinsam in der küche zu abend. sie bereitet sich sorgfältig auf ihre prüfungen vor."
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
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "les élèves lisent beaucoup de livres à la bibliothèque de la ville chaque semaine. le soir la famille dîne ensemble dans la cuisine. elle se prépare soigneusement pour ses examens."
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
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "los estudiantes leen muchos libros en la biblioteca de la ciudad cada semana. por la noche la familia cena junta en la cocina. se prepara cuidadosamente para sus exámenes."
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
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "学生们每周在城市图书馆读很多书。晚上一家人在厨房一起吃晚饭。她认真地准备考试。"
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
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "gli studenti leggono molti libri nella biblioteca della città ogni settimana. la sera la famiglia cena insieme in cucina. si prepara con cura per i suoi esami."
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
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "os estudantes leem muitos livros na biblioteca da cidade todas as semanas. à noite a família janta junta na cozinha. ela se prepara cuidadosamente para os seus exames."
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
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "de leerlingen lezen elke week veel boeken in de stadsbibliotheek. s avonds eet het gezin samen in de keuken. zij bereidt zich zorgvuldig voor op haar examens."
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
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "студенты каждую неделю читают много книг в городской библиотеке. вечером семья вместе ужинает на кухне. она тщательно готовится к своим экзаменам."
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
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "学生たちは毎週市立図書館でたくさんの本を読みます。夜には家族が台所で一緒に夕食を食べます。彼女は試験の準備を丁寧にします。"
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
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "eleverne læser mange bøger på byens bibliotek hver uge. om aftenen spiser familien aftensmad sammen i køkkenet. han forbereder sig grundigt til sine prøver og eksamener."
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
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "eleverna läser många böcker på stadens bibliotek varje vecka. på kvällen äter familjen middag tillsammans i köket. han förbereder sig noggrant inför sina prov och tentor."
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
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "opiskelijat lukevat monia kirjoja kaupungin kirjastossa joka viikko. illalla perhe syö yhdessä illallista keittiössä. hän valmistautuu huolellisesti kokeisiinsa."
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
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "οι μαθητές διαβάζουν πολλά βιβλία στη βιβλιοθήκη της πόλης κάθε εβδομάδα. το βράδυ η οικογένεια τρώει δείπνο μαζί στην κουζίνα. προετοιμάζεται προσεκτικά για τις εξετάσεις του."
    ),
    # round 14: six more of the reference plugin's language surface
    # (VERDICT r13 item 3 — broaden toward the language-identifier
    # plugin's coverage): pl/cs/no/hu/ro/tr, 20 profiles total
    "pl": (
        "szybki brązowy lis przeskakuje nad leniwym psem. "
        "to jest proste zdanie z kilkoma popularnymi polskimi słowami. "
        "jutro rano idziemy na targ kupić chleb i mleko. "
        "nie ma nic lepszego niż dobra książka w deszczowe popołudnie. "
        "pogoda jest dziś bardzo ładna a dzieci bawią się na dworze. "
        "chciałbym podziękować wszystkim za pomoc w tym projekcie. "
        "powiedziała że spotkanie odbędzie się w przyszłym tygodniu w czwartek. "
        "ludzie często zapominają jak ważne jest picie wystarczającej ilości wody. "
        "historia miasta sięga ponad tysiąca lat wstecz. "
        "to był najlepszy czas i to był najgorszy czas."
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "uczniowie czytają wiele książek w miejskiej bibliotece każdego tygodnia. wieczorem rodzina je razem kolację w kuchni. przygotowuje się starannie do swoich egzaminów."
    ),
    "cs": (
        "rychlá hnědá liška skáče přes líného psa. "
        "toto je jednoduchá věta s několika běžnými českými slovy. "
        "zítra ráno jdeme na trh koupit chléb a mléko. "
        "není nic lepšího než dobrá kniha v deštivém odpoledni. "
        "počasí je dnes velmi pěkné a děti si hrají venku. "
        "rád bych poděkoval všem za pomoc s tímto projektem. "
        "řekla že schůzka se bude konat příští týden ve čtvrtek. "
        "lidé často zapomínají jak je důležité pít dostatek vody. "
        "historie města sahá více než tisíc let zpátky. "
        "byl to nejlepší čas a byl to nejhorší čas."
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "studenti čtou mnoho knih v městské knihovně každý týden. večer jí rodina společně večeři v kuchyni. připravuje se pečlivě na své zkoušky."
    ),
    "no": (
        "den raske brune reven hopper over den late hunden. "
        "dette er en enkel setning med noen vanlige norske ord. "
        "vi skal på markedet i morgen tidlig for å kjøpe brød og melk. "
        "det finnes ikke noe bedre enn en god bok en regnfull ettermiddag. "
        "været er veldig fint i dag og barna leker utenfor. "
        "jeg vil gjerne takke alle for hjelpen med dette prosjektet. "
        "hun sa at møtet skal finne sted neste uke på torsdag. "
        "folk glemmer ofte hvor viktig det er å drikke nok vann. "
        "byens historie går mer enn tusen år tilbake. "
        "det var den beste tiden og det var den verste tiden."
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "elevene leser mange bøker på byens bibliotek hver uke. om kvelden spiser familien middag sammen på kjøkkenet. han forbereder seg grundig til prøvene og eksamenene sine."
    ),
    "hu": (
        "a gyors barna róka átugrik a lusta kutya felett. "
        "ez egy egyszerű mondat néhány gyakori magyar szóval. "
        "holnap reggel a piacra megyünk kenyeret és tejet venni. "
        "nincs jobb egy jó könyvnél egy esős délutánon. "
        "ma nagyon szép az idő és a gyerekek kint játszanak. "
        "szeretném megköszönni mindenkinek a segítségét ebben a projektben. "
        "azt mondta hogy a találkozó jövő héten csütörtökön lesz. "
        "az emberek gyakran elfelejtik milyen fontos elég vizet inni. "
        "a város története több mint ezer évre nyúlik vissza. "
        "ez volt a legjobb idő és ez volt a legrosszabb idő."
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "a tanulók sok könyvet olvasnak a városi könyvtárban minden héten. este a család együtt vacsorázik a konyhában. gondosan készül a vizsgáira."
    ),
    "ro": (
        "vulpea maro rapidă sare peste câinele leneș. "
        "aceasta este o propoziție simplă cu câteva cuvinte românești obișnuite. "
        "mâine dimineață mergem la piață să cumpărăm pâine și lapte. "
        "nu există nimic mai bun decât o carte bună într-o după-amiază ploioasă. "
        "vremea este foarte frumoasă astăzi și copiii se joacă afară. "
        "aș dori să mulțumesc tuturor pentru ajutorul lor cu acest proiect. "
        "ea a spus că întâlnirea va avea loc săptămâna viitoare joi. "
        "oamenii uită adesea cât de important este să bea destulă apă. "
        "istoria orașului se întinde pe mai mult de o mie de ani. "
        "a fost cel mai bun timp și a fost cel mai rău timp."
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "elevii citesc multe cărți la biblioteca orașului în fiecare săptămână. seara familia ia cina împreună în bucătărie. se pregătește cu grijă pentru examenele sale."
    ),
    "tr": (
        "hızlı kahverengi tilki tembel köpeğin üzerinden atlar. "
        "bu bazı yaygın türkçe kelimeler içeren basit bir cümledir. "
        "yarın sabah ekmek ve süt almak için pazara gidiyoruz. "
        "yağmurlu bir öğleden sonra iyi bir kitaptan daha güzel bir şey yoktur. "
        "bugün hava çok güzel ve çocuklar dışarıda oynuyor. "
        "bu projedeki yardımları için herkese teşekkür etmek istiyorum. "
        "toplantının gelecek hafta perşembe günü yapılacağını söyledi. "
        "insanlar yeterince su içmenin ne kadar önemli olduğunu sık sık unutur. "
        "şehrin tarihi bin yıldan daha eskiye uzanır. "
        "zamanların en iyisiydi ve zamanların en kötüsüydü."
        # r14 balance block (library/dinner/exams prose, all 20 languages)
        "öğrenciler her hafta şehir kütüphanesinde birçok kitap okur. akşamları aile mutfakta birlikte yemek yer. sınavlarına dikkatlice hazırlanır."
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
