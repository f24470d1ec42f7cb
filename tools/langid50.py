"""Synthetic 53-language / 13-script corpus for language-ID evaluation.

Word pools are common/function words per language (public knowledge —
the classic closed-class vocabulary every langid paper samples from).
Docs are seeded-random draws from ONE pool each, so the task is real
(heavily shared orthography inside the Latin and Cyrillic blocks) but
fully reproducible. Shared by tests/test_langid_model.py's 50-language
floors and tools/ext_bench.py's L=53 broadcast/score row.
"""

from __future__ import annotations

import random

# script name -> {lang: pool}
POOLS50: dict[str, dict[str, list[str]]] = {
    "latin": {
        "en": "the and of to in is that it was for on with as his they be at one have this from or had by not".split(),
        "de": "der die und das ist nicht ein mit von zu sich auf für wird eine werden auch nach wenn über durch ihre beim".split(),
        "fr": "le la les et des est un une du que dans pour qui sur pas plus par avec tout nous comme mais être cette".split(),
        "es": "el la los las que de un una es por con para como más pero sus le ha me si sin sobre este cuando".split(),
        "it": "il la che di un una per con del non sono della anche come dalla gli nel alla più questo suo essere ogni".split(),
        "pt": "o que de um uma para com não por mais das como mas foi ele ser tem seu sua ou quando muito nos já".split(),
        "nl": "de het een van is dat in te zijn op niet met voor als maar om ook er uit aan bij naar dan wordt".split(),
        "pl": "się nie jest na do tak jak ale czy już tylko przez jego było być może przy tym bardzo kiedy przed oraz".split(),
        "cs": "je se na to že s jak ale by bylo jsem být může při tom velmi když před jsou podle nebo tak co za".split(),
        "ro": "și de la cu un o este pentru care nu mai din sau dar fost sunt său această după prin între fără".split(),
        "hu": "a az és hogy nem is egy meg már csak volt van lesz lehet mint ez arra ezek minden ilyen vagy ha".split(),
        "fi": "ja on ei se että hän oli mutta kun niin ovat ole myös jos joka mikä tämä kaikki vain sitten kuin".split(),
        "sv": "och att det som en är på av för med den inte har till om man kan vid ska där eller mycket".split(),
        "da": "og at det som en er på af for med den ikke har til om man kan ved skal hvor eller meget bliver".split(),
        "no": "og at det som en er på av for med den ikke har til om man kan ved skal hvor eller mye blir vil".split(),
        "tr": "bir ve bu için ile olarak daha çok ama gibi kadar sonra ancak değil olan var yok ben sen biz onlar ise".split(),
        "vi": "của và là có trong được cho không người với này những một các đã về khi đến từ cũng sẽ ra như trên".split(),
        "id": "yang dan di dengan untuk dari pada ini itu tidak adalah akan ke oleh juga atau dalam telah bisa saya kita".split(),
        "ms": "yang dan di dengan untuk daripada pada ini itu tidak adalah akan kepada oleh juga atau dalam telah boleh saya kami".split(),
        "sw": "na ya wa kwa ni za katika la hii kama cha kuwa hiyo pia watu yake sana lakini tu ili ambayo baada".split(),
        "ca": "el la els les que de un una és per amb com més però seus li ha em si sense sobre aquest quan molt".split(),
        "hr": "je i u na se da s za što kako ali ako samo kroz njegov bilo biti može pri tome vrlo kada prije ili".split(),
        "sl": "je in v na se da s za kaj kako ampak če samo skozi njegov bilo biti lahko pri tem zelo ko pred ali".split(),
        "et": "ja on ei see et ta oli aga kui siis olid ole samuti kas mis kes need kõik ainult pärast nagu oma".split(),
        "lv": "un ir ne tas ka viņš bija bet kad tad viņi nav arī vai kas kurš šis visi tikai pēc kā savu par".split(),
        "lt": "ir yra ne tai kad jis buvo bet kai tada jie nėra taip pat arba kas kuris šis visi tik po kaip savo".split(),
        "sq": "dhe në një për me të nga kjo ai nuk është do më por si kur pas sipas ose midis pa gjatë deri".split(),
        "eu": "eta da ez hori baina egin zen dela izan ere du bat honek guztiak bakarrik ondoren bezala edo artean gabe arte".split(),
        "gl": "o que de un unha para con non por máis das como pero foi el ser ten seu súa ou cando moito xa".split(),
        "is": "og að það sem einn er á af fyrir með hinn ekki hefur til um maður getur við skal hvar eða mjög".split(),
        "af": "die en van het is dat in te wees op nie met vir as maar om ook daar uit aan by na dan word".split(),
    },
    "cyrillic": {
        "ru": "и в не на что он как это по но они мы из его все так она было если уже для вот меня только".split(),
        "uk": "і в не на що він як це по але вони ми з його все так вона було якщо вже для ось мене тільки".split(),
        "bg": "и в не на че той как това по но те ние от него все така тя беше ако вече за да се са".split(),
        "sr": "и у не на што он као то по али они ми из његов све тако она било ако већ за да се је".split(),
        "be": "і ў не на што ён як гэта па але яны мы з яго ўсё так яна было калі ўжо для вось мяне".split(),
        "kk": "және бұл бір мен ол үшін бар деп та болып жылы оның деген жоқ керек еді өз сол туралы ғана арқылы".split(),
    },
    "greek": {
        "el": "και το να του με την από είναι που δεν για στο μια τον οι αυτό όπως θα τους κατά ένα".split(),
    },
    "arabic": {
        "ar": "في من على أن إلى عن مع هذا التي الذي كان لم ما لا هو هي كل بعد قد حيث".split(),
        "fa": "در از به که این را با است برای آن یک خود تا بر او ما اما یا هم نیز".split(),
        "ur": "کے میں کی سے ہے کا اور پر یہ کو نے بھی لیے گیا تھا ہیں ایک اپنے نہیں کر".split(),
    },
    "hebrew": {
        "he": "של את על לא זה הוא עם כל אם אני היא יש הם אבל גם כי מה או רק עוד".split(),
    },
    "devanagari": {
        "hi": "के में की से है का और पर यह को ने भी लिए गया था हैं एक अपने नहीं कि".split(),
        "mr": "आणि आहे या त्या मध्ये ते हे एक नाही केले होते आहेत असे तर काही व पण मी तो ती".split(),
    },
    "bengali": {
        "bn": "এবং এর এই যে না করে থেকে তার সঙ্গে হয় একটি কিন্তু তিনি আমি তা হবে ছিল জন্য আরও বা".split(),
    },
    "tamil": {
        "ta": "அந்த இந்த என்று ஒரு மற்றும் அது நான் அவர் என உள்ளது இருந்து இல்லை ஆனால் என்ன அதன் மிக பல தான் நாம் வரை".split(),
    },
    "telugu": {
        "te": "మరియు ఈ ఆ ఒక అని కూడా నుండి చాలా కానీ అతను నేను మీరు వారు ఉంది లేదు అయితే ఇది తన కోసం పై".split(),
    },
    "thai": {
        "th": "ที่ และ เป็น ใน ของ มี ไม่ ให้ ได้ ว่า จะ มา กับ ไป นี้ การ ความ คน ปี แต่".split(),
    },
    "georgian": {
        "ka": "და რომ არ ის ეს არის იყო მე შენ ჩვენ თქვენ ისინი მისი ამ უნდა იმ რა თუ როგორც შემდეგ".split(),
    },
    "armenian": {
        "hy": "եվ որ է այս այն նա ես մենք դուք նրանք իր այդ պետք մի ինչ թե ինչպես հետո համար մասին".split(),
    },
    "cjk": {
        "zh": "的 是 不 了 在 人 有 我 他 这 个 们 中 来 上 大 为 和 国 地".split(),
        "ja": "の に は を た が で て と し れ さ ある いる も する から な こと として".split(),
        "ko": "이 그 저 것 수 들 는 에 의 를 가 은 로 으로 하다 있다 없다 하는 그리고 하지만".split(),
    },
}

SCRIPT_OF: dict[str, str] = {
    lang: script for script, langs in POOLS50.items() for lang in langs
}

N_LANGS = sum(len(v) for v in POOLS50.values())


def corpus_rows(
    n_per_lang: int = 40, words_per_doc: int = 18, seed: int = 11
) -> list[tuple[int, str, str]]:
    """(doc_id, text, lang) rows — seeded draws, shuffled."""
    rng = random.Random(seed)
    rows: list[tuple[int, str, str]] = []
    i = 0
    for script in sorted(POOLS50):
        for lang, pool in sorted(POOLS50[script].items()):
            for _ in range(n_per_lang):
                rows.append(
                    (i, " ".join(rng.choices(pool, k=words_per_doc)), lang)
                )
                i += 1
    rng.shuffle(rows)
    return rows
