"""The reference's golden query corpus — every enumerated item in
/root/reference/data/riyadussalihin/TEST_QUERIES.md (the header table
counts 86 across 7 categories; the sections enumerate 118 items — all
ported), with the spec-grounded pinned intent per id.

ONE definition shared by the behavioral tests
(tests/test_golden_corpus.py), the metrics report
(scripts/golden_metrics.py), and the oracle-checked registry query
(plans/routing.golden_intent_router) — so the driver's DuckDB gate
exercises the COMPLETE golden corpus, not a sample. Parity notes for the
non-obvious pins live in the test module's docstring."""

from __future__ import annotations

# (query id, query text, pinned intent) — text verbatim from TEST_QUERIES.md.
GOLDEN: list[tuple[str, str, str]] = [
    # -- 1. exact references (8) ------------------------------------------
    ("1.1", "Riyad as-Salihin 1", "exact_reference"),
    ("1.2", "Riyad as-Salihin 680", "exact_reference"),
    ("1.3", "Book 1, Hadith 10", "exact_reference"),
    ("1.4", "Introduction, Hadith 25", "exact_reference"),
    ("1.5", "Find hadith 1511", "exact_reference"),
    ("1.6", "Show me Riyad as-Salihin 993", "exact_reference"),
    ("1.7", "hadith number 682", "exact_reference"),
    ("1.8", "reference: Introduction 8", "exact_reference"),
    # -- 2. narrator-based (10) -------------------------------------------
    ("2.1", "Hadith narrated by Abu Hurairah", "narrator"),
    ("2.2", "What did 'Aishah narrate about the Prophet's speech?", "thematic"),
    ("2.3", "أحاديث رواها ابن مسعود", "contextual_arabic"),
    ("2.4", "Find hadith from Mu'adh bin Jabal about the tongue", "thematic"),
    ("2.5", "Narrations from Ibn 'Umar", "thematic"),
    ("2.6", "Show me hadith from Anas bin Malik about water", "thematic"),
    ("2.7", "Abu Hurairah about sins", "thematic"),
    ("2.8", "Stories narrated by Fatimah", "narrator"),
    ("2.9", "Hadith from Abdullah bin Amr", "thematic"),
    ("2.10", "What did Ibn Abbas say about patience?", "thematic"),
    # -- 3. English thematic (23) -----------------------------------------
    ("3.1.1", "hadith on the signs of a hypocrite", "thematic"),
    ("3.1.2", "what is backbiting in Islam?", "thematic"),
    ("3.1.3", "hadith about controlling your anger", "thematic"),
    ("3.1.4", "how to avoid lying", "thematic"),
    ("3.1.5", "hadith about speaking good or remaining silent", "thematic"),
    ("3.1.6", "stories of repentance in hadith", "thematic"),
    ("3.1.7", "hadith about not speaking ill of others", "thematic"),
    ("3.1.8", "two-faced person in hadith", "thematic"),
    ("3.1.9", "hadith on fulfilling promises", "thematic"),
    ("3.1.10", "importance of modesty in Islam", "thematic"),
    ("3.2.1", "virtues of reciting Surah Al-Ikhlas", "thematic"),
    ("3.2.2", "hadith on what to say after hearing the Adhan", "thematic"),
    ("3.2.3", "reward for performing Wudu' perfectly", "thematic"),
    ("3.2.4", "hadith about reading Quran daily", "thematic"),
    ("3.2.5", "benefits of Surah Al-Kahf on Friday", "thematic"),
    ("3.2.6", "hadith about prayer times", "thematic"),
    ("3.2.7", "virtues of fasting", "mixed"),  # 3 tokens; ref router agrees
    ("3.2.8", "hadith on night prayer", "thematic"),
    ("3.3.1", "hadith about intention (niyyah)", "thematic"),
    ("3.3.2", "hadith on patience during hardship", "thematic"),
    ("3.3.3", "importance of being truthful", "thematic"),
    ("3.3.4", "hadith about controlling the tongue", "thematic"),
    ("3.3.5", "good manners in Islam", "thematic"),
    # -- 4. Arabic thematic (15) ------------------------------------------
    ("4.1.1", "حديث عن فضل تلاوة القرآن", "contextual_arabic"),
    ("4.1.2", "فضل الوضوء", "contextual_arabic"),
    ("4.1.3", "فضل سورة الكهف", "contextual_arabic"),
    ("4.1.4", "دعاء بعد الأذان", "contextual_arabic"),
    ("4.1.5", "أجر الصلاة في المسجد", "contextual_arabic"),
    ("4.1.6", "فضل قراءة سورة الإخلاص", "contextual_arabic"),
    ("4.2.1", "أحاديث عن الصبر", "contextual_arabic"),
    ("4.2.2", "تحريم الغيبة والنميمة", "contextual_arabic"),
    ("4.2.3", "ما هو النفاق", "contextual_arabic"),
    ("4.2.4", "حديث عن حفظ اللسان", "contextual_arabic"),
    ("4.2.5", "عقوبة الكذب", "contextual_arabic"),
    ("4.2.6", "تحريم الكذب", "contextual_arabic"),
    ("4.2.7", "النهي عن الغضب", "contextual_arabic"),
    ("4.3.1", "إنما الأعمال بالنيات", "contextual_arabic"),
    ("4.3.2", "حديث عن الإخلاص", "contextual_arabic"),
    # -- 5. keyword & exact phrase (18) -----------------------------------
    ("5.1.1", '"speak good or remain silent"', "thematic"),
    ("5.1.2", '"deeds are considered by the intentions"', "thematic"),
    ("5.1.3", '"shyness is a branch of faith"', "thematic"),
    ("5.1.4", '"modesty is a part of Iman"', "thematic"),
    ("5.1.5", '"religion is sincerity"', "thematic"),
    ("5.1.6", '"actions are judged by intentions"', "thematic"),
    ("5.1.7", '"the strong person is the one who controls himself"', "thematic"),
    ("5.1.8", '"whoever believes in Allah and the Last Day"', "thematic"),
    ("5.2.1", '"اتقوا الله واصبروا"', "contextual_arabic"),
    ("5.2.2", '"الحياء من الإيمان"', "contextual_arabic"),
    ("5.2.3", '"إنما الأعمال بالنيات"', "contextual_arabic"),
    ("5.2.4", '"أفرى الفرى"', "contextual_arabic"),
    ("5.2.5", '"الدين النصيحة"', "contextual_arabic"),
    ("5.2.6", '"من كان يؤمن بالله واليوم الآخر"', "contextual_arabic"),
    ("5.3.1", 'hadith mentioning "Al-Wasilah"', "thematic"),
    ("5.3.2", 'find hadith with "Dajjal"', "thematic"),
    ("5.3.3", 'hadith about "Al-Ghurr Al-Muhajjalun"', "thematic"),
    ("5.3.4", "hadith mentioning Jibril", "mixed"),  # 3 tokens, no quotes
    # -- 6. mixed language & cross-lingual (10) ---------------------------
    ("6.1", "hadith about الصبر (patience)", "thematic"),
    ("6.2", "what is النية in hadith?", "thematic"),
    ("6.3", "Abu Hurairah عن الإيمان", "narrator"),  # parity, see docstring
    ("6.4", 'English translation of "إنما الأعمال بالنيات"', "thematic"),
    ("6.5", "hadith on الوضوء (wudu)", "thematic"),
    ("6.6", 'find hadith with phrase "Al-Ghurr Al-Muhajjalun" in Arabic',
     "thematic"),
    ("6.7", "Ibn Umar about الحياء", "thematic"),
    ("6.8", "virtues of قراءة القرآن", "thematic"),
    ("6.9", "what is الغيبة والنميمة", "contextual_arabic"),
    ("6.10", "hadith on الصدق (truthfulness)", "thematic"),
    # -- 7. complex & compound (11) ---------------------------------------
    ("7.1.1", "Abu Hurairah about charity", "thematic"),
    ("7.1.2", "'Aishah narrating about modesty", "thematic"),
    ("7.1.3", "Ibn 'Umar on prayer", "thematic"),
    ("7.1.4", "Anas bin Malik about water and purity", "thematic"),
    ("7.1.5", "Ibn Mas'ud on reciting Quran", "thematic"),
    ("7.2.1", "Sahih hadith on patience", "thematic"),
    ("7.2.2", "authentic hadith about repentance", "thematic"),
    ("7.2.3", "weak hadith on virtues (should rank lower)", "thematic"),
    ("7.3.1", "hadith from Book of Good Manners about promises", "thematic"),
    ("7.3.2", "prohibition in Book 17", "thematic"),  # NOT a reference
    ("7.3.3", "virtues from the introduction", "thematic"),
    # -- 8. edge cases (8) --------------------------------------------------
    ("8.1", "hadith about something not in the dataset", "thematic"),
    ("8.2", "random gibberish query: asdfghjkl", "thematic"),
    ("8.3", "very long query with many irrelevant terms: I want to find a "
     "hadith that talks about patience and how to be patient during "
     "difficult times when facing hardships and trials in life", "thematic"),
    ("8.4", "patience", "mixed"),
    ("8.5", "special characters: hadith@#$%", "mixed"),
    ("8.6", "numbers only: 12345", "mixed"),  # 'numbers'/'only' not ref vocab
    ("8.7", "mixed scripts: حديثpatience模忍", "mixed"),
    ("8.8", "", "mixed"),
    # -- 9. story & narrative (5) -----------------------------------------
    ("9.1", "story of the three men in the cave", "thematic"),
    ("9.2", "hadith about the person who killed 99 people", "thematic"),
    ("9.3", "story of the man who never did good except Tawheed", "thematic"),
    ("9.4", "hadith about the prostitute who gave water to a dog", "thematic"),
    ("9.5", "story of the man who gave charity secretly", "thematic"),
    # -- 10. question-based (10) ------------------------------------------
    ("10.1", "How to attain patience in Islam?", "thematic"),
    ("10.2", "What are the signs of a hypocrite?", "thematic"),
    ("10.3", "When should I recite Surah Al-Kahf?", "thematic"),
    ("10.4", "Why is intention important in Islam?", "thematic"),
    ("10.5", "How to avoid backbiting?", "thematic"),
    ("10.6", "What to say after the Adhan?", "thematic"),
    ("10.7", "How to perform perfect wudu?", "thematic"),
    ("10.8", "What breaks modesty?", "mixed"),  # 3 tokens; ref router agrees
    ("10.9", "How to control anger?", "thematic"),
    ("10.10", "What are the rights of a guest?", "thematic"),
]
