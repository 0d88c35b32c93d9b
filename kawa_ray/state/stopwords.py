"""Per-language stopword sets.

The reference ships 474 KB of stopwords for 134 languages
(/root/reference/ontology/stopwords.py:5).  We carry compact public
common-word lists for the languages the synthetic corpus exercises; the
engine takes any ``{lang: set[str]}`` mapping, so a full list drops in
without code changes.
"""

from __future__ import annotations

ALL_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        """a an the and or but if of in on at to for from by with as is are was
        were be been being it its this that these those he she they them his her
        their we you i me my your our us not no so do does did have has had will
        would can could should may might there here then than about into over
        under out up down off again once only own same too very just because
        while during before after above below between through all any both each
        few more most other some such what which who whom when where why how""".split()
    ),
    "es": frozenset(
        """el la los las un una unos unas y o pero si de del en a al por para con
        como es son era eran ser sido se su sus este esta estos estas ese esa
        eso aquel que quien cual cuando donde no ni ya muy mas menos tambien
        entre sobre sin hasta desde lo le les nos me mi tu te yo usted""".split()
    ),
    "fr": frozenset(
        """le la les un une des et ou mais si de du en a au aux par pour avec
        comme est sont etait etaient etre ete se son sa ses ce cette ces cela qui
        que quand ou non ne pas plus moins aussi entre sur sous sans depuis dans
        nous vous ils elles je tu il elle on leur lui y en""".split()
    ),
    "de": frozenset(
        """der die das ein eine einer eines dem den und oder aber wenn von im in
        auf an zu fur mit als ist sind war waren sein gewesen sich sein seine
        ihre dieser diese dieses jener welche wer wann wo nicht kein schon sehr
        nur auch zwischen uber unter ohne seit bei wir ihr sie ich du er es man
        uns euch ihnen""".split()
    ),
    "pt": frozenset(
        """o a os as um uma uns umas e ou mas se de do da dos das em no na nos
        nas por para com como é são era eram ser sido seu sua seus suas este
        esta isto esse essa isso aquele que quem qual quando onde não nem já
        muito mais menos também entre sobre sem até desde lhe lhes nós me minha
        teu te eu você""".split()
    ),
    "vi": frozenset(
        """và hoặc nhưng nếu của trong trên tại đến cho từ bởi với như là được
        đã sẽ có không này đó các những một hai ông bà anh chị em tôi bạn chúng
        họ nó mình rất chỉ cũng vì khi nào đâu sao thế thì mà ra vào lại""".split()
    ),
    "ar": frozenset(
        """في من الى على عن مع هذا هذه ذلك تلك التي الذي ان كان كانت يكون هو هي
        هم نحن انا انت لا لم لن ما اذا او ثم حتى قد كل بعض غير بين فوق تحت منذ
        عند لدى""".split()
    ),
    "zh": frozenset("的 了 和 是 在 我 有 他 这 中 大 来 上 国 个 到 说 们 为 子 和 你 地 出 道 也 时 年 得 就 那 要 下 以 生 会 自 着 去 之 过 家 学 对 可 她 里 后 小 么 心 多".split()),
    "ja": frozenset("の に は を た が で て と し れ さ ある いる も する から な こと として い や など なっ ない この ため その あっ よう また もの という".split()),
    "ko": frozenset("이 그 저 것 수 등 들 및 에서 으로 에게 하다 있다 되다 않다 그리고 그러나 또는 하지만 즉 또한 의 를 은 는 이다".split()),
}

# Union across languages — used when the target language is unknown
# (reference: OntologyManager.stopwords_all, ontology_manager.py:86).
STOPWORDS_ALL: frozenset[str] = frozenset().union(*ALL_STOPWORDS.values())


def stopwords_for(lang: str | None) -> frozenset[str]:
    """Per-language set when known, union otherwise (reference
    ontology_manager.py:111)."""
    if lang:
        return ALL_STOPWORDS.get(lang, STOPWORDS_ALL)
    return STOPWORDS_ALL
