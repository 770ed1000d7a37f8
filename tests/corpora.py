"""Golden test corpora, copied verbatim from the reference test suite.

These are test DATA (sentences), not code. Citations:
- PANGRAM_DOCS: reference ``app/tests/final_ii.py:13-34`` with golden
  document frequencies at ``final_ii.py:73-84``.
- FLOWER_DOCS: reference ``app/tests/inverted_index_test_1.py:18-29``.
- SPRING_DOCS: reference ``app/tests/inverted_index_test_2.py:84-93``.
"""

PANGRAM_DOCS = [
    "The quick brown foxes jump over the lazy dogs",
    "Pack my boxes with five dozen liquor jugs",
    "How vexingly quick daft zebras jumping",
    "The five boxing wizards jumped quickly",
    "Sphinx of black quartz judge my vows",
    "Two driven jocks help fax my big quizzes",
    "Five quacking zephyrs jolt my wax bed",
    "The jay pigs foxes zebras and my wolves quack",
    "Quick zephyrs blow vexing daft jim",
    "Pack my red boxes with five dozen quality jugs",
    "Jinxed wizards plucking ivy from my quilt box",
    "How quickly daft jumping zebras vex",
    "Waltz nymph for quick jigs vex bud",
    "Quick foxes jumping nightly above wizard",
    "Five jumping wizards hex bolty quick",
    "The flowers are blooming in the gardens",
    "Many flowers bloomed last spring season",
    "Running dogs chase playing cats daily",
    "Cats running and dogs playing together",
    "Birds flying over blooming flower fields",
]

# Golden document frequencies after stem+merge (final_ii.py:73-84).
PANGRAM_GOLDEN_DF = {
    "quick": 8,
    "jump": 6,
    "wizard": 4,
    "fox": 3,
    "box": 4,
    "flower": 3,
    "bloom": 3,
    "run": 2,
    "dog": 3,
    "cat": 2,
}

PANGRAM_QUERIES = [
    "quick fox", "jump", "wizard", "fox", "box",
    "flower", "bloom", "run", "dog", "cat",
]

FLOWER_DOCS = [
    "Beautiful flowers bloom in spring time",
    "The garden is full of red and yellow flowers",
    "I love flowers, especially roses and lilies",
    "Flowers make people happy and bring joy",
    "Spring flowers are the first sign of the season",
    "These flowers smell wonderful",
    "The flower shop sells fresh bouquets",
    "Wild flowers grow in the meadow",
    "She likes to pick flowers in the morning",
    "The flower arrangement looks perfect",
]

FLOWER_QUERIES = [
    "flower", "flowers", "spring flower", "beautiful flowers", "flower garden",
]

SPRING_DOCS = [
    "Spring is a season of renewal spring and fresh beginnings.",
    "Flowers bloom in abundance during the spring season.",
    "In spring, the days grow longer, and the weather becomes warmer.",
    "Spring brings colorful flowers and fresh green leaves on trees.",
    "Many animals come out of hibernation in spring.",
    "The arrival of spring means the return of chirping birds.",
    "Spring is a popular time for planting gardens and growing flowers.",
    "Summer, Winter, Fall, and many other seasons.",
]

SPRING_QUERIES = ["Spring flowers"]

ALL_QUERIES = (
    PANGRAM_QUERIES
    + FLOWER_QUERIES
    + SPRING_QUERIES
    # repeated term: query-side tf=2 exercises w_tq with tf>1
    + ["love", "quick zebras jumping", "garden season bloom",
       "spring spring flowers", "quick quick quick fox"]
)
