"""Few-shot demonstrations for reasoning-chain construction and triple selection.

Original demonstration data with the same SCHEMA as the reference's
`prompts/kg_selection/*_demonstrations.py`:

- ``*_REASONING_CHAIN_EXAMPLARS``: ``{"question", "chains", "answer"}`` where
  ``chains`` is a comma-separated sequence of ``<h; r; t>`` triples — consumed
  by the chain constructor prompt (`knowledge_graph/models.py:1544-1561`).
- ``*_TRIPLE_SELECTION_EXAMPLARS``: per-hop multiple-choice records
  ``{"question", "triples", "candidate_triples", "answer", "cot_answer"}`` —
  consumed by the optional LLM TripleSelector.
"""

HOTPOTQA_REASONING_CHAIN_EXAMPLARS = [
    {
        "question": "In which country is the bridge named after the inventor of the phonograph?",
        "chains": "<Edison Bridge; named after; Thomas Edison>, "
                  "<Thomas Edison; invented; phonograph>, "
                  "<Edison Bridge; located in; New Jersey>, "
                  "<New Jersey; country; United States>",
        "answer": "United States",
    },
    {
        "question": "What award did the debut film of the director of Monsoon Wedding win?",
        "chains": "<Monsoon Wedding; directed by; Mira Nair>, "
                  "<Salaam Bombay!; debut feature film of; Mira Nair>, "
                  "<Salaam Bombay!; won; Camera d'Or>",
        "answer": "Camera d'Or",
    },
    {
        "question": "Which rocket was developed under the leadership of a scientist brought to "
                    "America by Operation Paperclip?",
        "chains": "<Operation Paperclip; brought to America; German scientists>, "
                  "<Wernher von Braun; participant of; Operation Paperclip>, "
                  "<Wernher von Braun; led the development of; Saturn V rocket>",
        "answer": "Saturn V",
    },
    {
        "question": "Who managed the band that recorded The Velvet Underground & Nico?",
        "chains": "<The Velvet Underground & Nico; recorded by; The Velvet Underground>, "
                  "<The Velvet Underground; managed by; Andy Warhol>",
        "answer": "Andy Warhol",
    },
    {
        "question": "Is the deepest lake in the world located in Russia or Canada?",
        "chains": "<Lake Baikal; is; deepest lake in the world>, "
                  "<Lake Baikal; located in; southern Siberia, Russia>",
        "answer": "Russia",
    },
]

WIKIMULTIHOPQA_REASONING_CHAIN_EXAMPLARS = [
    {
        "question": "Who was the father of the Queen of England married to Henry VI?",
        "chains": "<Margaret of Anjou; spouse; Henry VI>, "
                  "<Margaret of Anjou; father; Rene, King of Naples>",
        "answer": "Rene, King of Naples",
    },
    {
        "question": "Where did the director of A Trip to the Moon die?",
        "chains": "<A Trip to the Moon; directed by; Georges Melies>, "
                  "<Georges Melies; place of death; Paris>",
        "answer": "Paris",
    },
    {
        "question": "Who directed the film whose score was composed by the composer born in Frankfurt in 1957?",
        "chains": "<Hans Zimmer; born in; Frankfurt>, "
                  "<Hans Zimmer; composed the score for; Inception>, "
                  "<Inception; directed by; Christopher Nolan>",
        "answer": "Christopher Nolan",
    },
    {
        "question": "Which dynasty was founded by the builder of Tughlaqabad Fort?",
        "chains": "<Tughlaqabad Fort; built by; Ghiyas-ud-din Tughlaq>, "
                  "<Ghiyas-ud-din Tughlaq; founder of; Tughlaq dynasty>",
        "answer": "Tughlaq dynasty",
    },
    {
        "question": "Who taught piano to the wife of Robert Schumann?",
        "chains": "<Clara Schumann; spouse; Robert Schumann>, "
                  "<Friedrich Wieck; was piano teacher of; Clara Schumann>",
        "answer": "Friedrich Wieck",
    },
]

MUSIQUE_REASONING_CHAIN_EXAMPLARS = [
    {
        "question": "In which country is the largest seaport in Europe?",
        "chains": "<Port of Rotterdam; is; largest seaport in Europe>, "
                  "<Port of Rotterdam; located in; Rotterdam>, "
                  "<Rotterdam; located in province; South Holland>, "
                  "<South Holland; country; Netherlands>",
        "answer": "Netherlands",
    },
    {
        "question": "In which city did the New Zealand soprano perform at the 1981 royal wedding?",
        "chains": "<Kiri Te Kanawa; is; New Zealand soprano>, "
                  "<Kiri Te Kanawa; performed at; wedding of Prince Charles and Lady Diana Spencer>, "
                  "<wedding of Prince Charles and Lady Diana Spencer; held at; St Paul's Cathedral>, "
                  "<St Paul's Cathedral; located in; London>",
        "answer": "London",
    },
    {
        "question": "In which state is the national park containing mainland Australia's highest mountain?",
        "chains": "<Mount Kosciuszko; is; highest mountain in mainland Australia>, "
                  "<Mount Kosciuszko; within; Kosciuszko National Park>, "
                  "<Kosciuszko National Park; located in; New South Wales>",
        "answer": "New South Wales",
    },
    {
        "question": "Who produced the third album of the band from Abingdon?",
        "chains": "<Radiohead; from; Abingdon, Oxfordshire>, "
                  "<OK Computer; third album of; Radiohead>, "
                  "<OK Computer; produced with; Nigel Godrich>",
        "answer": "Nigel Godrich",
    },
]

HOTPOTQA_TRIPLE_SELECTION_EXAMPLARS = [
    {
        "question": "What award did the debut film of the director of Monsoon Wedding win?",
        "triples": [],
        "candidate_triples": [
            "A. <Monsoon Wedding; directed by; Mira Nair>",
            "B. <Salaam Bombay!; won; Camera d'Or>",
            "C. <Mira Nair; born in; Rourkela, Odisha>",
            "D. <Lake Baikal; is a; rift lake>",
            "E. <The Velvet Underground; formed in; 1964>",
        ],
        "answer": "A",
        "cot_answer": "The question asks about the debut film of Monsoon Wedding's director, so "
                      "first identify the director. The answer is: A.",
    },
    {
        "question": "What award did the debut film of the director of Monsoon Wedding win?",
        "triples": ["<Monsoon Wedding; directed by; Mira Nair>"],
        "candidate_triples": [
            "A. <Mira Nair; born in; Rourkela, Odisha>",
            "B. <Salaam Bombay!; debut feature film of; Mira Nair>",
            "C. <Edison Bridge; named after; Thomas Edison>",
            "D. <Camera d'Or; awarded at; 1988 Cannes Film Festival>",
            "E. <Operation Paperclip; occurred after; World War II>",
        ],
        "answer": "B",
        "cot_answer": "Knowing Mira Nair directed Monsoon Wedding, the next step is her debut "
                      "feature film. The answer is: B.",
    },
    {
        "question": "What award did the debut film of the director of Monsoon Wedding win?",
        "triples": [
            "<Monsoon Wedding; directed by; Mira Nair>",
            "<Salaam Bombay!; debut feature film of; Mira Nair>",
        ],
        "candidate_triples": [
            "A. <Camera d'Or; awarded at; 1988 Cannes Film Festival>",
            "B. <Salaam Bombay!; won; Camera d'Or>",
            "C. <Mira Nair; is; Indian-American filmmaker>",
            "D. <The Velvet Underground; managed by; Andy Warhol>",
            "E. <Lake Baikal; depth; 1,642 metres>",
        ],
        "answer": "B",
        "cot_answer": "The chain identified Salaam Bombay! as the debut film; now the award it "
                      "won completes the path. The answer is: B.",
    },
]

WIKIMULTIHOPQA_TRIPLE_SELECTION_EXAMPLARS = [
    {
        "question": "Where did the director of A Trip to the Moon die?",
        "triples": [],
        "candidate_triples": [
            "A. <A Trip to the Moon; directed by; Georges Melies>",
            "B. <Georges Melies; year of death; 1938>",
            "C. <Hans Zimmer; born in; Frankfurt>",
            "D. <Margaret of Anjou; spouse; Henry VI>",
            "E. <Tughlaqabad Fort; built in; 1321>",
        ],
        "answer": "A",
        "cot_answer": "First identify who directed A Trip to the Moon. The answer is: A.",
    },
    {
        "question": "Where did the director of A Trip to the Moon die?",
        "triples": ["<A Trip to the Moon; directed by; Georges Melies>"],
        "candidate_triples": [
            "A. <Georges Melies; year of death; 1938>",
            "B. <Georges Melies; place of death; Paris>",
            "C. <A Trip to the Moon; is a; 1902 French science fiction film>",
            "D. <Clara Schumann; father; Friedrich Wieck>",
            "E. <Inception; directed by; Christopher Nolan>",
        ],
        "answer": "B",
        "cot_answer": "The chain identifies Georges Melies as the director; the question asks "
                      "where he died. The answer is: B.",
    },
]

MUSIQUE_TRIPLE_SELECTION_EXAMPLARS = [
    {
        "question": "In which country is the largest seaport in Europe?",
        "triples": ["<Port of Rotterdam; is; largest seaport in Europe>",
                    "<Port of Rotterdam; located in; Rotterdam>"],
        "candidate_triples": [
            "A. <Rotterdam; located in province; South Holland>",
            "B. <Radiohead; formed in; 1985>",
            "C. <Mount Kosciuszko; part of range; Snowy Mountains>",
            "D. <Kiri Te Kanawa; is; New Zealand soprano>",
            "E. <OK Computer; third album of; Radiohead>",
        ],
        "answer": "A",
        "cot_answer": "The port is in Rotterdam; to reach the country, the province comes next. "
                      "The answer is: A.",
    },
]


HOTPOTQA_REASONING_CHAIN_EXAMPLARS += [
    {
        "question": "Who engineered the suspension bridge that connects San Francisco to Marin County?",
        "chains": "<Golden Gate Bridge; connects; San Francisco and Marin County>, "
                  "<Golden Gate Bridge; chief engineer; Joseph Strauss>",
        "answer": "Joseph Strauss",
    },
    {
        "question": "Who starred in the 1998 film adaptation of the Pulitzer-winning novel by the 1993 Nobel laureate in Literature?",
        "chains": "<Toni Morrison; won; Nobel Prize in Literature>, "
                  "<Toni Morrison; Nobel Prize year; 1993>, "
                  "<Beloved; written by; Toni Morrison>, "
                  "<Beloved; adapted into film in; 1998>, "
                  "<Beloved (1998 film); starring; Oprah Winfrey>",
        "answer": "Oprah Winfrey",
    },
    {
        "question": "Near which city is the organization where the World Wide Web was invented?",
        "chains": "<World Wide Web; invented at; CERN>, <CERN; located near; Geneva>",
        "answer": "Geneva",
    },
]

WIKIMULTIHOPQA_REASONING_CHAIN_EXAMPLARS += [
    {
        "question": "Who was the father of the mathematician who worked with Charles Babbage?",
        "chains": "<Ada Lovelace; worked with; Charles Babbage>, "
                  "<Ada Lovelace; father; Lord Byron>",
        "answer": "Lord Byron",
    },
    {
        "question": "Which studio produced the film that won the Academy Award for Best Animated Feature in 2003?",
        "chains": "<Spirited Away; won; Academy Award for Best Animated Feature>, "
                  "<Spirited Away; Academy Award year; 2003>, "
                  "<Spirited Away; produced by; Studio Ghibli>",
        "answer": "Studio Ghibli",
    },
]

MUSIQUE_REASONING_CHAIN_EXAMPLARS += [
    {
        "question": "In which country is the citadel publicized by Hiram Bingham in 1911?",
        "chains": "<Machu Picchu; publicized by; Hiram Bingham>, "
                  "<Machu Picchu; located in; Cusco Region>, "
                  "<Cusco Region; country; Peru>",
        "answer": "Peru",
    },
    {
        "question": "Who was the first director-general of the broadcaster headquartered in the City of Westminster?",
        "chains": "<British Broadcasting Corporation; headquartered at; Broadcasting House>, "
                  "<Broadcasting House; located in; City of Westminster>, "
                  "<British Broadcasting Corporation; first director-general; John Reith>",
        "answer": "John Reith",
    },
]

HOTPOTQA_TRIPLE_SELECTION_EXAMPLARS += [
    {
        "question": "Near which city is the organization where the World Wide Web was invented?",
        "triples": ["<World Wide Web; invented at; CERN>"],
        "candidate_triples": [
            "A. <CERN; operates; Large Hadron Collider>",
            "B. <CERN; located near; Geneva>",
            "C. <World Wide Web; invented by; Tim Berners-Lee>",
            "D. <Golden Gate Bridge; opened in; 1937>",
            "E. <Toni Morrison; was; American novelist>",
        ],
        "answer": "B",
        "cot_answer": "The chain places the invention at CERN; the question asks for the "
                      "nearby city. The answer is: B.",
    },
]
