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


# Round-2 breadth extension toward the reference's 134 languages
# (compact common-function-word sets, written from public knowledge —
# NOT copied from the reference's 474 KB lists):
_EXTENDED: dict[str, frozenset[str]] = {
    "af": frozenset("""die en van het is nie ek jy hy sy ons julle hulle wat met vir om te was sal""".split()),
    "am": frozenset("""እና ነው ወደ ላይ ውስጥ እኔ አንተ እሷ እነሱ ይህ ያ ምን ግን""".split()),
    "as": frozenset("""আৰু এটা এই মই তুমি সি আমি তেওঁলোক নহয় কি কিন্তু বাবে সৈতে পৰা আছে আছিল""".split()),
    "az": frozenset("""və bir bu o mən sən biz siz onlar ilə üçün ki amma da də var idi""".split()),
    "ba": frozenset("""һәм бер был ул мин һин беҙ һеҙ улар өсөн тип бар ине юҡ ләкин""".split()),
    "be": frozenset("""і у на з не я ты ён яна мы вы яны гэта што але як для па ад да""".split()),
    "bg": frozenset("""и в на е се да не аз ти той тя ние вие те това що но за с от по""".split()),
    "bn": frozenset("""এবং একটি এই আমি তুমি সে আমরা তারা না কি কিন্তু জন্য সঙ্গে থেকে হয় ছিল""".split()),
    "bo": frozenset("""དང གཅིག འདི ང ཁྱོད ཁོ ང་ཚོ ཁོང་ཚོ མིན གང ཡིན ལ ནས""".split()),
    "bs": frozenset("""i u na je se da ne ja ti on ona mi vi oni ovo to što ali za sa od""".split()),
    "ca": frozenset("""el la els les un una i o però si de del en a al per amb com és són que no""".split()),
    "ceb": frozenset("""ang sa ug mga ako ikaw siya kami sila kini kana nga dili aduna""".split()),
    "co": frozenset("""è un in di ùn eiu tù ellu noi voi elli questu chì ma per cù da""".split()),
    "cv": frozenset("""тата пӗр ку вӑл эпӗ эсӗ эпир эсир вӗсем валли тесе пур ҫук анчах""".split()),
    "cy": frozenset("""a yr yn i o ar mae roedd fi ti ef hi ni chi nhw hyn na ond am gyda""".split()),
    "dv": frozenset("""އަދި އެއް މި އަހަރެން ތިބާ އޭނާ އަހަރެމެން އެމީހުން ނޫން ކޮން އެކަމަކު އަށް އާއެކު އިން""".split()),
    "eo": frozenset("""la kaj en de al por kun ne mi vi li ŝi ni ili tio ĉi estas estis sed""".split()),
    "et": frozenset("""ja on ei ma sa ta me te nad see et aga kui siis oma mis kes kus""".split()),
    "eu": frozenset("""eta bat da ez ni zu hura gu zuek haiek hau hori baina zer non nola""".split()),
    "fa": frozenset("""و در به از که این آن من تو او ما شما آنها است بود نه اما برای با""".split()),
    "fy": frozenset("""en in is net ik do hy sy wy jimme hja dit dat mar foar mei fan op""".split()),
    "ga": frozenset("""agus an na is ní mé tú sé sí muid sibh siad seo sin ach le do ar""".split()),
    "gd": frozenset("""agus an na is chan mi thu e i sinn sibh iad seo sin ach le do air""".split()),
    "gl": frozenset("""o a os as un unha e ou pero se de do en ao por para con como é son que non""".split()),
    "gu": frozenset("""અને એક આ હું તું તે અમે તેઓ નથી શું પણ માટે સાથે થી છે હતું""".split()),
    "ha": frozenset("""da a cikin ni kai shi ita mu ku su wannan ba amma don tare ne ya""".split()),
    "he": frozenset("""של את על אני אתה הוא היא אנחנו אתם הם זה לא מה אבל כי עם אל יש היה""".split()),
    "hmn": frozenset("""thiab ib no kuv koj nws peb lawv tsis dab tsi tab sis rau nrog los""".split()),
    "hr": frozenset("""i u na je se da ne ja ti on ona mi vi oni ovo to što ali za s od""".split()),
    "ht": frozenset("""ak yon nan mwen ou li nou yo sa pa ki men pou avèk se te""".split()),
    "hy": frozenset("""և մի այս ես դու նա մենք դուք նրանք ոչ ինչ բայց համար հետ ից է էր""".split()),
    "ig": frozenset("""na a m gị ọ anyị unu ha nke a mba ma maka ya bụ""".split()),
    "is": frozenset("""og í á er ekki ég þú hann hún við þið þeir þetta að en fyrir með sem var""".split()),
    "jv": frozenset("""lan siji iki aku kowe dheweke awake dhewe ora apa nanging kanggo karo saka""".split()),
    "ka": frozenset("""და არის არ მე შენ ის ჩვენ თქვენ ისინი ეს რომ მაგრამ რა სად""".split()),
    "kk": frozenset("""және бір бұл ол мен сен біз сіз олар үшін деп бар еді жоқ бірақ""".split()),
    "km": frozenset("""និង មួយ នេះ ខ្ញុំ អ្នក គាត់ យើង ពួកគេ ទេ អ្វី ប៉ុន្តែ សម្រាប់ ជាមួយ ពី""".split()),
    "kn": frozenset("""ಮತ್ತು ಒಂದು ಈ ನಾನು ನೀನು ಅವನು ನಾವು ಅವರು ಇಲ್ಲ ಏನು ಆದರೆ ಗಾಗಿ ಜೊತೆ ಇಂದ ಇದೆ""".split()),
    "ku": frozenset("""û yek ev ez tu ew em hûn ji bo bi ne lê çi li ser""".split()),
    "ky": frozenset("""жана бир бул ал мен сен биз силер алар үчүн деп бар эле жок бирок""".split()),
    "la": frozenset("""et in est non ego tu ille nos vos illi hic quod sed pro cum ab ad ut""".split()),
    "lb": frozenset("""an ass net ech du hien si mir dir dëst dat awer fir mat vun op""".split()),
    "ln": frozenset("""mpe moko oyo ngai yo ye biso bango te nini kasi mpo na elongo uta""".split()),
    "lo": frozenset("""ແລະ ຫນຶ່ງ ນີ້ ຂ້ອຍ ເຈົ້າ ລາວ ພວກເຮົາ ບໍ່ ແຕ່ ສໍາລັບ ກັບ ຈາກ""".split()),
    "lt": frozenset("""ir yra ne aš tu jis ji mes jūs jie tai kad bet už su iš į per""".split()),
    "lv": frozenset("""un ir nav es tu viņš viņa mēs jūs viņi šis tas ka bet par ar no uz""".split()),
    "mg": frozenset("""sy ny amin izaho ianao izy isika izy ireo tsy fa ho amin'ny avy""".split()),
    "mhr": frozenset("""да ик тиде мый тый тудо ме те нуно уке мо но верч дене гыч""".split()),
    "mi": frozenset("""me te i a au koe ia matou ratou tenei kaore engari mo ki mai""".split()),
    "mk": frozenset("""и во на е се да не јас ти тој таа ние вие тие ова што но за со од""".split()),
    "ml": frozenset("""ഉം ഒരു ഈ ഞാൻ നീ അവൻ ഞങ്ങൾ അവർ ഇല്ല എന്ത് പക്ഷേ വേണ്ടി കൂടെ നിന്ന് ആണ്""".split()),
    "mn": frozenset("""ба нэг энэ би чи тэр бид та нар тэд үгүй юу гэхдээ төлөө хамт аас""".split()),
    "mr": frozenset("""आणि एक हा मी तू तो आम्ही ते नाही काय पण साठी सोबत पासून आहे होता""".split()),
    "ms": frozenset("""dan satu ini saya awak dia kami mereka tidak apa tetapi untuk dengan dari adalah""".split()),
    "mt": frozenset("""u wieħed dan jien int hu aħna huma ma xiex imma għal ma' minn hija kien""".split()),
    "my": frozenset("""နှင့် သည် ကို မှာ က ငါ သူ ဒါ မ ဘာ""".split()),
    "ne": frozenset("""र एक यो म तिमी ऊ हामी उनीहरू होइन के तर लागि संग बाट छ थियो""".split()),
    "no": frozenset("""og i på er ikke jeg du han hun vi dere de dette at men for med av til som var""".split()),
    "om": frozenset("""fi tokko kana ani ati inni nuti isaan miti maal garuu dhaaf wajjin irraa""".split()),
    "or": frozenset("""ଏବଂ ଏକ ଏହି ମୁଁ ତୁମେ ସେ ଆମେ ସେମାନେ ନାହିଁ କଣ କିନ୍ତୁ ପାଇଁ ସହିତ ରୁ ଅଛି ଥିଲା""".split()),
    "pa": frozenset("""ਅਤੇ ਇੱਕ ਇਹ ਮੈਂ ਤੂੰ ਉਹ ਅਸੀਂ ਨਹੀਂ ਕੀ ਪਰ ਲਈ ਨਾਲ ਤੋਂ ਹੈ ਸੀ""".split()),
    "ps": frozenset("""او یو دا زه ته هغه موږ تاسو دوی نه څه خو لپاره سره له دی و""".split()),
    "rw": frozenset("""na rimwe iki njye wowe we twebwe bo oya iki ariko kubera hamwe kuva""".split()),
    "sa": frozenset("""च एकः अयम् अहम् त्वम् सः वयम् ते न किम् परन्तु कृते सह तः अस्ति आसीत्""".split()),
    "sd": frozenset("""۽ هڪ هي مان تون هو اسان توهان اهي نه ڇا پر لاءِ سان کان آهي هو""".split()),
    "si": frozenset("""සහ එක මේ මම ඔයා ඔහු අපි ඔවුන් නැහැ මොකක්ද නමුත් සඳහා සමඟ සිට""".split()),
    "sk": frozenset("""a v na je sa nie ja ty on ona my vy oni toto že ale pre s od do""".split()),
    "sl": frozenset("""in v na je se ne jaz ti on ona mi vi oni to da ampak za z od do""".split()),
    "sm": frozenset("""ma se i le ou oe ia matou latou lenei leai ae mo faatasi mai""".split()),
    "sn": frozenset("""uye imwe iyi ini iwe iye isu ivo kwete chii asi nokuti ne kubva""".split()),
    "so": frozenset("""iyo mid kan aniga adiga isaga annaga iyaga ma maxay laakiin u la ka waa""".split()),
    "sq": frozenset("""dhe një të në me për nga është janë unë ti ai ajo ne ju ata kjo ky që por""".split()),
    "sr": frozenset("""и у на је се да не ја ти он она ми ви они ово то што али за са од""".split()),
    "su": frozenset("""jeung hiji ieu abdi anjeun anjeunna urang maranehna henteu naon tapi pikeun sareng ti""".split()),
    "sw": frozenset("""na moja hii mimi wewe yeye sisi wao si nini lakini kwa pamoja kutoka ni alikuwa""".split()),
    "ta": frozenset("""மற்றும் ஒரு இந்த நான் நீ அவன் நாம் அவர்கள் இல்லை என்ன ஆனால் க்காக உடன் இருந்து""".split()),
    "te": frozenset("""మరియు ఒక ఈ నేను నువ్వు అతను మేము వారు లేదు ఏమి కానీ కోసం తో నుండి ఉంది""".split()),
    "tg": frozenset("""ва як ин ман ту ӯ мо шумо онҳо не чӣ аммо барои бо аз аст буд""".split()),
    "ti": frozenset("""እና ሓደ እዚ ኣነ ንስኻ ንሱ ንሕና ንሳቶም ኣይኮነን እንታይ ግን ንምእንቲ ምስ ካብ""".split()),
    "tk": frozenset("""we bir bu ol men sen biz siz olar üçin diýip bar ýok emma bilen""".split()),
    "tl": frozenset("""ang ng sa at ako ikaw siya kami sila ito iyan hindi may para kung""".split()),
    "tt": frozenset("""һәм бер бу ул мин син без сез алар өчен дип бар иде юк ләкин""".split()),
    "ug": frozenset("""ۋە بىر بۇ ئۇ مەن سەن بىز سىلەر ئۇلار ئۈچۈن دەپ بار يوق لېكىن""".split()),
    "ur": frozenset("""اور ایک یہ میں تم وہ ہم آپ نہیں کیا لیکن لیے ساتھ سے ہے تھا کے کو پر""".split()),
    "uz": frozenset("""va bir bu u men sen biz siz ular uchun deb bor edi yo'q lekin bilan""".split()),
    "wo": frozenset("""ak benn bii man yow moom nun ñoom déedéet lan waaye ngir ak ci""".split()),
    "yi": frozenset("""און א די דער דאס איך דו ער זי מיר איר זיי נישט וואס אבער פאר מיט פון""".split()),
    "yo": frozenset("""ati ọkan yi emi iwọ oun awa wọn ko kini ṣugbọn fun pẹlu lati ni jẹ""".split()),
    "zu": frozenset("""futhi eyodwa lokhu mina wena yena thina bona cha yini kodwa ngoba nge kusuka""".split()),
}
ALL_STOPWORDS.update(_EXTENDED)

# Round-3 breadth: the languages (and romanised variants) present in the
# reference's 134-key stopword map but absent above — compact
# hand-assembled common-word/function-word lists, same as the rest of
# this module.  ``*_rom`` keys are romanisations (the reference carries
# them for transliterated web text); ``my_zaw`` is the Zawgyi-encoded
# Burmese slot (fixture list is standard-Unicode Burmese — the encoding
# difference matters only for real Zawgyi corpora).
_ROUND3 = {
    "br": frozenset("""ha an ar eo da e en ur ul un gant evit met war ken
        hon me te ni int bet mat holl pe""".split()),
    "ff": frozenset("""e ko no be mi a o min en on nder wonde kala fof hay
        so si ngam sabu ndee""".split()),
    "fil": frozenset("""ang ng sa na at ay mga ako ka siya kami tayo sila
        ito iyan hindi oo po ba ko mo niya natin nila para kung pero wala
        may dahil""".split()),
    "gn": frozenset("""ha pe upe ko che nde ore avei oĩ peteĩ mokõi guive
        rehe ndive añete katu ndaha'éi""".split()),
    "haw": frozenset("""ka ke nā o a i ma he ua e au ia kākou lākou kēia
        kēlā me no mai aku ana la""".split()),
    "lg": frozenset("""nga mu ku ne era naye oba kino ekyo nze ggwe ye ffe
        mmwe bo okuva buli kyokka wabula""".split()),
    "li": frozenset("""de het een en van in op mit veur es is waor zien dat
        dit dae die neet ouch nog al bie um mer""".split()),
    "ns": frozenset("""le go ka ga e o ba re ke se sa ya wa la a mo yo gore
        gomme ge fela""".split()),
    "ny": frozenset("""ndi ku za pa mu kwa ndipo koma kapena ngati chifukwa
        uyu awa ine iwe iye ife inu iwo onse ayi inde""".split()),
    "qu": frozenset("""kay chay wak ñuqa qam pay ñuqanchik qamkuna paykuna
        mana arí ima wan manta kama paq rayku hina ichaqa utaq""".split()),
    "rm": frozenset("""il la ils las in ina e ed u da dad en cun per sin tar
        che quai quel questa era ma betg gia anc""".split()),
    "sc": frozenset("""su sa sos sas unu una e de in a cun pro chi custu
        cussu issu issa nois bois issos no ma puru comente""".split()),
    "ss": frozenset("""na ku la le lo nga kutsi kodvwa noma ngoba mine wena
        yena tsine nine bona konkhe futsi cha yebo""".split()),
    "st": frozenset("""le ho ka ha e o ba re ke se sa ea oa la mo eo tsa
        hore empa kapa hobane feela joale hape""".split()),
    "tj": frozenset("""ва дар ба аз ки ин он ман ту мо шумо онҳо бо барои
        аммо ё не ҳа ҳам чӣ""".split()),
    "tn": frozenset("""le go ka ga e o ba re ke se sa ya wa la mo yo tsa
        gore mme kgotsa gonne fela jaanong gape""".split()),
    "xh": frozenset("""na ku e i u le lo aba oku ukuba kodwa okanye kuba mna
        wena yena thina nina bona onke hayi ewe kakhulu njengoko""".split()),
    "my_zaw": frozenset("""၏ သည် က ကို မှာ နှင့် လည်း တွင် မ ဘူး ငါ နင် သူ
        ဒီ ဟို ဘာ ဘယ် ရှိ ဖြစ်""".split()),
    "bg_rom": frozenset("""az ti toy tya nie vie te da ne na v s za ot po
        kato tova li shte sam e sa no ili ako""".split()),
    "bn_rom": frozenset("""ami tumi apni se amra tara ei oi ki na ar o ebong
        kintu jodi keno kothay kemon ache chilo hobe kore theke jonno
        sathe""".split()),
    "el_rom": frozenset("""kai na to i o den tha se me gia apo ena mia einai
        eimai eisai emeis eseis autos auti auto alla an pos pou ti""".split()),
    "hi_rom": frozenset("""hai hain ka ki ke ko se mein par aur ya nahi kya
        yah vah main tum aap hum ve tha thi the hoga karna liye saath
        lekin agar""".split()),
    "ja_rom": frozenset("""no wa ga wo ni de to mo kara made desu da shita
        suru aru iru kore sore are nani watashi anata kare kanojo soshite
        demo shikashi""".split()),
    "ru_rom": frozenset("""i v vo ne chto on na ya s so kak a to vse ona tak
        ego no da ty k u zhe vy za by po tolko mne bylo""".split()),
    "ta_rom": frozenset("""naan nee avan aval adhu naam neengal avargal
        indha andha enna illai aam mattrum aanal allathu eppadi enge
        eppodhu irukku seyya vendum udan""".split()),
    "te_rom": frozenset("""nenu nuvvu atanu aame adi memu meeru vaaru idi ee
        aa emi kaadu avunu mariyu kaani leda ela ekkada eppudu undi
        cheyyali kosam tho""".split()),
    "ur_rom": frozenset("""hai hain ka ki ke ko se mein par aur ya nahi kya
        yeh woh main tum aap hum tha thi they hoga karna liye saath lekin
        agar magar""".split()),
    "zh_rom": frozenset("""de le shi bu wo ni ta women nimen tamen zhe na
        you zai he yu dan huozhe yinwei suoyi shenme zenme nali xianzai
        yao hui neng dou hen ye""".split()),
}
ALL_STOPWORDS.update(_ROUND3)

# the reference's 134 stopword language keys (stopwords.py:5) — coverage
# is gated >= this set in tests/test_lang_resources.py
REFERENCE_STOPWORD_LANGS = frozenset(
    """af am ar as az be bg bg_rom bn bn_rom br bs ca ceb co cs cy da de el
    el_rom en eo es et eu fa ff fi fil fr fy ga gd gl gn gu ha haw he hi
    hi_rom hmn hr ht hu hy id ig is it ja ja_rom jv ka kk km kn ko ku ky la
    lb lg li ln lo lt lv mg mi mk ml mn mr ms mt my my_zaw ne nl no ns ny om
    or pa pl ps pt qu rm ro ru ru_rom sa sc sd si sk sl sm sn so sq sr ss st
    su sv sw ta ta_rom te te_rom tg th tj tl tn tr ug uk ur ur_rom uz vi wo
    xh yi yo zh zh_rom zu""".split()
)

STOPWORDS_ALL: frozenset[str] = frozenset().union(*ALL_STOPWORDS.values())


def stopwords_for(lang: str | None) -> frozenset[str]:
    """Per-language set when known, union otherwise (reference
    ontology_manager.py:111)."""
    if lang:
        return ALL_STOPWORDS.get(lang, STOPWORDS_ALL)
    return STOPWORDS_ALL
