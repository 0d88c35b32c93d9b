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
    "ru": frozenset(
        """и в во не что он на я с со как а то все она так его но да ты к у же
        вы за бы по только ее мне было вот от меня еще нет о из ему теперь когда
        даже ну вдруг ли если уже или ни быть был него до вас нибудь опять уж вам
        ведь там потом себя ничего ей может они тут где есть надо ней для мы тебя
        их чем была сам чтоб без будто чего раз тоже себе под будет ж тогда кто
        этот""".split()
    ),
    "it": frozenset(
        """il lo la i gli le un uno una e o ma se di del della dei delle in a al
        alla ai alle per con su come è sono era erano essere stato si suo sua
        suoi sue questo questa questi queste quello che chi quale quando dove non
        ne già molto più meno anche tra fra senza fino da ci vi mi ti io tu noi
        voi loro""".split()
    ),
    "nl": frozenset(
        """de het een en of maar als van in op aan te voor met door als is zijn
        was waren geweest zich zijn haar hun dit dat deze die wat welke wie
        wanneer waar niet geen zo doen doet deed hebben heeft had zal zou kan kon
        er hier dan toen over onder uit weer nog alleen ook heel erg net omdat
        terwijl ik je jij wij zij jullie u mij mijn jouw ons""".split()
    ),
    "pl": frozenset(
        """i w we nie że on na ja z ze jak a to wszystko ona tak jego ale da ty
        do u już po tylko jej mnie było tu od mnie jeszcze o z niego teraz kiedy
        nawet no nagle czy jeśli już lub ani być był go aż was coś znowu wam
        przecież tam potem siebie nic jej może oni gdzie jest trzeba dla my cię
        ich niż była sam żeby bez jakby czego raz też sobie pod będzie kto ten""".split()
    ),
    "tr": frozenset(
        """ve bir bu da de için ile olarak daha çok en gibi kadar sonra önce ama
        fakat veya ya ki mi mu ne o şu ben sen biz siz onlar benim senin onun
        bizim sizin onların var yok değil ise eğer çünkü ancak hem şey her hiç
        bazı tüm bütün kendi şimdi zaman yıl gün iki üç olan oldu olur olmak etti
        eder etmek yapıyor yaptı yapmak""".split()
    ),
    "id": frozenset(
        """yang dan di ke dari untuk dengan pada adalah ini itu tidak ada akan
        atau juga sudah telah bisa dapat harus dalam oleh karena jika kalau
        sebagai tentang seperti antara namun tetapi tapi saya aku kamu dia kami
        kita mereka anda nya lah kah pun saja hanya lebih sangat paling masih
        lagi baru sekali para saat ketika dimana bagaimana mengapa apa siapa""".split()
    ),
    "sv": frozenset(
        """och i att det som en på är av för med till den har de inte om ett han
        men var jag sig från vi så kan man när år alla sina här ha mot alla andra
        mycket nu efter sin där vid kunde något skulle dessa dem vara sitt denna
        du ni er min din vår deras vad vem hur varför då sedan under över mellan
        utan bara även ännu redan""".split()
    ),
    "da": frozenset(
        """og i at det som en på er af for med til den har de ikke om et han men
        var jeg sig fra vi så kan man når år alle sine her have mod andre meget
        nu efter sin der ved kunne noget skulle disse dem være sit denne du i
        jeres min din vores deres hvad hvem hvordan hvorfor da siden under over
        mellem uden bare også endnu allerede""".split()
    ),
    "fi": frozenset(
        """ja on ei se että hän oli en ovat mutta niin kuin myös jos vain joka
        mitä tämä nämä ne sitä sen siitä siihen kanssa ilman ennen jälkeen yli
        alle välillä vielä jo nyt sitten kun koska vaikka tai sekä mikä kuka
        missä miten miksi minä sinä me te he hänen minun sinun meidän teidän
        heidän olla olen olet olemme olette""".split()
    ),
    "cs": frozenset(
        """a v ve ne že on na já s se jak to vše ona tak jeho ale ano ty k u už
        po jen její mně bylo tady od ještě o z němu teď když i náhle zda pokud
        nebo ani být byl do vás něco zase vám přece tam potom sebe nic jí možná
        oni tady kde je třeba pro my tě jejich než byla sám aby bez jako čeho
        jednou také sobě pod bude kdo tento""".split()
    ),
    "ro": frozenset(
        """și în la de pe cu un o este sunt era erau fi fost se al a ai ale
        acest această aceste acel acea care cine când unde nu nici așa doar mai
        puțin foarte între prin fără până din ca dacă dar sau pentru despre eu
        tu el ea noi voi ei ele meu tău său nostru vostru lor ce cum""".split()
    ),
    "hu": frozenset(
        """és a az egy hogy nem is van volt lesz lenni el fel le ki be meg át
        rá ide oda ez az ezek azok aki ami amely mikor hol miért hogyan én te ő
        mi ti ők enyém tiéd övé miénk tiétek övék de vagy ha mert mint még már
        csak nagyon több kevesebb minden semmi valami bármi között alatt felett
        nélkül ellen után előtt""".split()
    ),
    "el": frozenset(
        """και σε από για με στο στη στον στην ο η το οι τα ένας μία ένα είναι
        ήταν να θα δεν μην που ποιος ποια ποιο πότε πού γιατί πώς εγώ εσύ αυτός
        αυτή αυτό εμείς εσείς αυτοί μου σου του της μας σας τους αλλά ή αν επειδή
        όταν όπως μετά πριν πάνω κάτω μεταξύ χωρίς μόνο πολύ πιο ήδη ακόμα τώρα
        τότε εδώ εκεί""".split()
    ),
    "uk": frozenset(
        """і в у не що він на я з із як а то все вона так його але так ти до у
        вже по тільки її мені було тут від ще о з нього тепер коли навіть ну
        раптом чи якщо або ні бути був до вас щось знову вам адже там потім себе
        нічого їй може вони де є треба для ми тебе їх ніж була сам щоб без наче
        чого раз теж собі під буде хто цей""".split()
    ),
    "hi": frozenset(
        """के का एक में की है यह और से हैं को पर इस होता कि जो कर मे गया करने
        किया लिये अपने ने बनी नहीं तो ही या एवं दिया हो इसका था द्वारा हुआ तक
        साथ करना वाले बाद लिए आप कुछ सकते किसी ये इसके सबसे इसमें थे दो होने वह
        वे करते बहुत कहा वर्ग कई करें होती अपनी उनके थी यदि हुई जा ना इसे""".split()
    ),
    "th": frozenset(
        """ที่ การ และ ใน ของ มี ได้ ให้ เป็น ไป มา ว่า จะ ไม่ กับ แต่ หรือ ก็ นี้ นั้น ซึ่ง อยู่
        อย่าง เมื่อ ความ แล้ว ถูก ต้อง จาก โดย ถ้า เพราะ เขา เธอ ฉัน ผม คุณ เรา พวก มัน
        ตาม ทั้ง ยัง คือ ด้วย จึง เลย ทำ อีก ๆ""".split()
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
