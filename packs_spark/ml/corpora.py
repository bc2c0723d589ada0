"""Tiny seed corpora per language — public high-frequency function/content
words, used to train the deterministic char-ngram langid and perplexity
models.  These are common-knowledge word lists (think "top-100 words"),
not copied from any corpus.
"""

SEED_SENTENCES: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and the people of the "
        "world said that this is a good day for all of us to be here with "
        "you and your friends because we have time and there is nothing "
        "more important than what we do now for the future of our children "
        "which they will remember when the years have passed and the house "
        "on the hill is still standing under the same old sky"
    ),
    "fr": (
        "le renard brun saute par dessus le chien paresseux et les gens du "
        "monde ont dit que ce jour est un bon jour pour nous tous parce que "
        "nous avons le temps et il n y a rien de plus important que ce que "
        "nous faisons maintenant pour l avenir de nos enfants dont ils se "
        "souviendront quand les annees seront passees et que la maison sur "
        "la colline sera toujours debout sous le meme vieux ciel"
    ),
    "de": (
        "der schnelle braune fuchs springt ueber den faulen hund und die "
        "menschen der welt sagten dass dies ein guter tag fuer uns alle ist "
        "weil wir zeit haben und es nichts wichtigeres gibt als das was wir "
        "jetzt fuer die zukunft unserer kinder tun an das sie sich erinnern "
        "werden wenn die jahre vergangen sind und das haus auf dem huegel "
        "noch immer unter dem gleichen alten himmel steht"
    ),
    "es": (
        "el zorro marron salta sobre el perro perezoso y la gente del mundo "
        "dijo que este es un buen dia para todos nosotros porque tenemos "
        "tiempo y no hay nada mas importante que lo que hacemos ahora por "
        "el futuro de nuestros hijos que ellos recordaran cuando los anos "
        "hayan pasado y la casa en la colina siga en pie bajo el mismo "
        "viejo cielo"
    ),
    "it": (
        "la volpe marrone salta sopra il cane pigro e la gente del mondo "
        "disse che questo e un buon giorno per tutti noi perche abbiamo "
        "tempo e non c e niente di piu importante di quello che facciamo "
        "adesso per il futuro dei nostri figli che ricorderanno quando gli "
        "anni saranno passati e la casa sulla collina sara ancora in piedi "
        "sotto lo stesso vecchio cielo"
    ),
}

# Per-language word pools for the synthetic generator (drawn from the same
# seed sentences so generated text is in-distribution for the models).
WORD_POOLS: dict[str, list[str]] = {
    lang: sorted(set(s.split())) for lang, s in SEED_SENTENCES.items()
}

# Toxicity blocklist for the scrub stage (placeholder terms — the real list
# is a config input; these are deliberately inoffensive stand-ins that the
# generator injects so the scrub path is exercised end-to-end).
BLOCKLIST_TERMS: list[str] = ["badword1", "badword2", "slurword"]
