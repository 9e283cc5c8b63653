"""Reference-parity corpora, transcribed from the reference test suites.

Sources (test DATA, required for rank-identical assertions):
- Planets: /root/reference/src/engine.test.ts:31-57
- carl friedrich (memory): /root/reference/src/engine.test.ts:137-231
- carl friedrich (binary ranks): /root/reference/src/engine-binary.test.ts:9-96
- Rank Haber: /root/reference/src/engine.test.ts:233-300
- Rank Star: /root/reference/src/engine.test.ts:302-344

Whitespace inside the texts is not significant to the engine (the
tokenizer splits on whitespace runs), so the multi-line template literals
are transcribed with plain wrapping.
"""

JUPITER_TEXT = (
    "Jupiter is the fifth planet from the Sun and the largest in the "
    "Solar System. It is a gas giant with a mass one-thousandth that of the Sun, "
    "but two-and-a-half times that of all the other planets in the Solar System "
    "combined. Jupiter is one of the brightest objects visible to the naked eye "
    "in the night sky, and has been known to ancient civilizations since before "
    "recorded history. It is named after the Roman god Jupiter.[18] When viewed "
    "from Earth, Jupiter can be bright enough for its reflected light to cast "
    "visible shadows,[19] and is on average the third-brightest natural object "
    "in the night sky after the Moon and Venus."
)

SATURN_TEXT = (
    "Saturn is the sixth planet from the Sun and the second-largest in the "
    "Solar System, after Jupiter. It is a gas giant with an average radius "
    "of about nine times that of Earth.[18][19] It only has one-eighth the "
    "average density of Earth; however, with its larger volume, Saturn is "
    "over 95 times more massive.[20][21][22] Saturn is named after the Roman "
    "god of wealth and agriculture; its astronomical symbol (♄) represents "
    "the god´s sickle."
)

PLANETS = [
    {"title": "Jupiter", "text": JUPITER_TEXT,
     "url": "https://en.wikipedia.org/wiki/Jupiter", "rank": 0},
    {"title": "Saturn", "text": SATURN_TEXT,
     "url": "https://en.wikipedia.org/wiki/Saturn", "rank": 1},
]

# engine.test.ts:138-208 — title = url.replace('_', ' ') (JS: FIRST '_' only)
_CARL_PAGES = [
    ("generalized by Friedrich Bessel are",
     "https://en.wikipedia.org/wiki/Bessel_function"),
    ("upon by Friedrich Hayek",
     "https://en.wikipedia.org/wiki/Economic_calculation_problem"),
    ("V or Friedrich V may",
     "https://en.wikipedia.org/wiki/Frederick_V"),
    ("other deities Friedrich Schelling 1775 ... word and Friedrich Welcker 1784",
     "https://en.wikipedia.org/wiki/Henotheism"),
    ("Johann Friedrich Agricola 4",
     "https://en.wikipedia.org/wiki/Johann_Friedrich_Agricola"),
    ("Johann Friedrich Endersch 25",
     "https://en.wikipedia.org/wiki/Johann_Friedrich_Endersch"),
    ("by Carl Friedrich Gauss in",
     "https://en.wikipedia.org/wiki/Modular_arithmetic"),
    ("and mineralogist Friedrich Mohs it",
     "https://en.wikipedia.org/wiki/Mohs_scale_of_mineral_hardness"),
    ("mathematician Carl Friedrich Gauss 1777",
     "https://en.wikipedia.org/wiki/Number_theory"),
    ("Georg Wilhelm Friedrich Hegel 1770 ... 1831 and Friedrich Wilhelm Joseph",
     "https://en.wikipedia.org/wiki/Panentheism"),
    ("Marx and Friedrich Engels Commissioned",
     "https://en.wikipedia.org/wiki/The_Communist_Manifesto"),
    ("also spelled Carl Friedrich Bahrdt was ... an unorthodox German Protestant "
     "biblical ... characters in German learning",
     "https://en.wikipedia.org/wiki/Karl_Friedrich_Bahrdt"),
    ("Franz Ludwig Carl Friedrich Passow September ... was a German classical scholar",
     "https://en.wikipedia.org/wiki/Franz_Passow"),
    ("Geologist Carl Friedrich Christian Mohs ... was a German geologist and",
     "https://en.wikipedia.org/wiki/Friedrich_Mohs"),
    ("of Johann Friedrich Meckel after",
     "https://en.wikipedia.org/wiki/Recapitulation_theory"),
    ('German mathematician "CARL FrieDricH" Gauss Richard',
     "https://en.wikipedia.org/wiki/G._Waldo_Dunnington"),
]

CARL_MEMORY = [
    {"title": url.replace("_", " ", 1), "text": text, "url": url, "rank": i + 1}
    for i, (text, url) in enumerate(_CARL_PAGES)
]

# engine-binary.test.ts: same corpus except doc 12 replaced; rank = base + i
_CARL_BINARY_PAGES = list(_CARL_PAGES)
_CARL_BINARY_PAGES[12] = (
    "Johann Carl Friedrich Gauss was a German mathematician and physicist "
    "who made significant contributions to many fields in mathematics and science.",
    "https://en.wikipedia.org/wiki/Carl_Friedrich_Gauss",
)
_CARL_BINARY_RANKS = [100] * 16
_CARL_BINARY_RANKS[12] = 10

CARL_BINARY = [
    {"title": url.replace("_", " ", 1), "text": text, "url": url,
     "rank": rank + i}
    for i, ((text, url), rank) in enumerate(
        zip(_CARL_BINARY_PAGES, _CARL_BINARY_RANKS)
    )
]

_PROCESS_TEXT = (
    "A process is series or set of activities that interact to "
    "produce a result; it may occur once-only or be recurrent or periodic."
)
_HABER_PROCESS_TEXT = (
    "The Haber process,[1] also called the Haber–Bosch process, "
    "is an artificial nitrogen fixation process and is the main "
    "industrial procedure for the production of ammonia today."
)

RANK_HABER = [
    {"title": "Process", "text": _PROCESS_TEXT,
     "url": "https://hackapedia.org/?id=12345", "rank": 0},
    {"title": "Process", "text": _PROCESS_TEXT,
     "url": "https://en.wikipedia.org/wiki/Process", "rank": 10},
    {"title": "Haber",
     "text": ('Haber is a surname of German origin. The meaning in '
              'old German is "oat". The cereal is now in German called "Hafer". '
              'The process of making is ....'),
     "url": "https://en.wikipedia.org/wiki/Haber", "rank": 10},
    {"title": "Haber process", "text": _HABER_PROCESS_TEXT,
     "url": "https://hackapedia.org/?id=4567&title=Haber", "rank": 10},
    {"title": "Haber process", "text": _HABER_PROCESS_TEXT,
     "url": "https://en.wikipedia.org/wiki/Haber_process", "rank": 10},
]

RANK_STAR = [
    {"title": "Technology in Star Trek",
     "text": ("The technology in Star Trek has borrowed many ideas from the "
              "scientific world. Episodes often contain technologies named after "
              "real-world scientific phenomena, such as tachyon beams, baryon "
              "sweeps, quantum slipstream drives, and photon torpedoes. Some of "
              "the technologies created for the Star Trek universe were done so "
              "out of financial necessity. For instance, the transporter was "
              "created because the limited budget of Star Trek: The Original "
              "Series (TOS) in the 1960s did not allow expensive shots of "
              "spaceships landing on planets.[1][page needed]"),
     "url": "https://en.wikipedia.org/wiki/Technology_in_Star_Trek",
     "rank": 100000},
    {"title": "Star Trek: The Original Series",
     "text": ("Star Trek is an American science-fiction television series "
              "created by Gene Roddenberry that follows the adventures of the "
              "starship USS Enterprise (NCC-1701) and its crew. It later "
              "acquired the retronym of Star Trek: The Original Series (TOS) to "
              "distinguish the show within the media franchise that it began."),
     "url": "https://en.wikipedia.org/wiki/Star_Trek:_The_Original_Series",
     "rank": 1000},
    {"title": "Star",
     "text": ("A star is an astronomical object consisting of a luminous "
              "spheroid of plasma held together by its own gravity. The nearest "
              "star to Earth is the Sun. Many other stars are visible to the "
              "naked eye from Earth during the night, appearing as a multitude "
              "of fixed luminous points in the sky due to their immense "
              "distance from Earth. Historically, the most prominent stars were "
              "grouped into constellations and asterisms, the brightest of "
              "which gained proper names. Astronomers have assembled star "
              "catalogues that identify the known stars and provide "
              "standardized stellar designations. The observable Universe "
              "contains an estimated 1×1024 stars,[1][2] but most are invisible "
              "to the naked eye from Earth, including all stars outside our "
              "galaxy, the Milky Way."),
     "url": "https://en.wikipedia.org/wiki/Star", "rank": 10},
]
