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


# ---------------------------------------------------------------------------
# Round-2 bank extension: the adaptive examplar RANKER
# (`kg/kg_generator.py` / `pipeline/kirag.py`) needs a real pool to rank over
# — the reference ships dozens of chain examplars and ~10 per-hop selection
# examplars per dataset (`prompts/kg_selection/hotpotqa_demonstrations.py:
# 1-120,1028-1048`). All records below are original text in the same schema.
# ---------------------------------------------------------------------------

HOTPOTQA_REASONING_CHAIN_EXAMPLARS += [
    {
        "question": "Who designed the tower that served as the entrance arch to the 1889 "
                    "World's Fair in Paris?",
        "chains": "<Eiffel Tower; served as; entrance arch to the 1889 World's Fair>, "
                  "<Eiffel Tower; located in; Paris>, "
                  "<Eiffel Tower; designed by; Gustave Eiffel>",
        "answer": "Gustave Eiffel",
    },
    {
        "question": "In which city is the museum housing the raft on which Thor Heyerdahl "
                    "crossed the Pacific in 1947?",
        "chains": "<Kon-Tiki; raft of; Thor Heyerdahl>, "
                  "<Kon-Tiki; crossed the Pacific in; 1947>, "
                  "<Kon-Tiki; displayed at; Kon-Tiki Museum>, "
                  "<Kon-Tiki Museum; located in; Oslo>",
        "answer": "Oslo",
    },
    {
        "question": "Which element did the first person to win two Nobel Prizes discover "
                    "together with her husband?",
        "chains": "<Marie Curie; was; first person to win two Nobel Prizes>, "
                  "<Marie Curie; spouse; Pierre Curie>, "
                  "<Marie Curie and Pierre Curie; discovered; polonium>",
        "answer": "polonium",
    },
    {
        "question": "In which Ohio town was the first person to walk on the Moon born?",
        "chains": "<Apollo 11; first Moon landing mission; 1969>, "
                  "<Neil Armstrong; first person to walk on; the Moon>, "
                  "<Neil Armstrong; born in; Wapakoneta, Ohio>",
        "answer": "Wapakoneta",
    },
    {
        "question": "In which city did the creator of Sherlock Holmes study medicine?",
        "chains": "<Sherlock Holmes; created by; Arthur Conan Doyle>, "
                  "<Arthur Conan Doyle; studied medicine in; Edinburgh>",
        "answer": "Edinburgh",
    },
    {
        "question": "Which structure stood longer, the Berlin Wall or the original "
                    "Crystal Palace in Hyde Park?",
        "chains": "<Berlin Wall; erected in; 1961>, <Berlin Wall; fell in; 1989>, "
                  "<Crystal Palace; built in Hyde Park in; 1851>, "
                  "<Crystal Palace; relocated from Hyde Park in; 1854>",
        "answer": "the Berlin Wall",
    },
    {
        "question": "Which Sherpa accompanied the New Zealand mountaineer on the first "
                    "ascent of Everest?",
        "chains": "<Edmund Hillary; was; New Zealand mountaineer>, "
                  "<Edmund Hillary; first ascent of Everest in; 1953>, "
                  "<Edmund Hillary; climbed with; Tenzing Norgay>",
        "answer": "Tenzing Norgay",
    },
    {
        "question": "For whom was the mausoleum in Agra commissioned by Shah Jahan built?",
        "chains": "<Taj Mahal; located in; Agra>, "
                  "<Taj Mahal; commissioned by; Shah Jahan>, "
                  "<Taj Mahal; built in memory of; Mumtaz Mahal>",
        "answer": "Mumtaz Mahal",
    },
    {
        "question": "What prize did the inventor of long-distance radio transmission share "
                    "in 1909?",
        "chains": "<Guglielmo Marconi; pioneered; long-distance radio transmission>, "
                  "<Guglielmo Marconi; shared in 1909; Nobel Prize in Physics>",
        "answer": "the Nobel Prize in Physics",
    },
    {
        "question": "Was the Eiffel Tower completed before or after Tower Bridge?",
        "chains": "<Eiffel Tower; completed in; 1889>, "
                  "<Tower Bridge; completed in; 1894>",
        "answer": "before",
    },
    {
        "question": "Who was married to the author of Frankenstein?",
        "chains": "<Frankenstein; written by; Mary Shelley>, "
                  "<Mary Shelley; spouse; Percy Bysshe Shelley>",
        "answer": "Percy Bysshe Shelley",
    },
    {
        "question": "Which novel by the author of Typee opens aboard a whaling ship "
                    "bound from Nantucket?",
        "chains": "<Typee; written by; Herman Melville>, "
                  "<Herman Melville; wrote; Moby-Dick>, "
                  "<Moby-Dick; opens aboard a whaler from; Nantucket>",
        "answer": "Moby-Dick",
    },
]

WIKIMULTIHOPQA_REASONING_CHAIN_EXAMPLARS += [
    {
        "question": "Where was the director of Seven Samurai born?",
        "chains": "<Seven Samurai; directed by; Akira Kurosawa>, "
                  "<Akira Kurosawa; place of birth; Tokyo>",
        "answer": "Tokyo",
    },
    {
        "question": "When did the composer of The Magic Flute die?",
        "chains": "<The Magic Flute; composed by; Wolfgang Amadeus Mozart>, "
                  "<Wolfgang Amadeus Mozart; year of death; 1791>",
        "answer": "1791",
    },
    {
        "question": "Where did the author of War and Peace die?",
        "chains": "<War and Peace; written by; Leo Tolstoy>, "
                  "<Leo Tolstoy; place of death; Astapovo>",
        "answer": "Astapovo",
    },
    {
        "question": "Which film was released first, Metropolis or Modern Times?",
        "chains": "<Metropolis; released in; 1927>, "
                  "<Modern Times; released in; 1936>",
        "answer": "Metropolis",
    },
    {
        "question": "Are Salvador Dali and Pablo Picasso of the same nationality?",
        "chains": "<Salvador Dali; nationality; Spanish>, "
                  "<Pablo Picasso; nationality; Spanish>",
        "answer": "yes",
    },
    {
        "question": "Who was the grandfather of Queen Victoria?",
        "chains": "<Queen Victoria; father; Prince Edward, Duke of Kent>, "
                  "<Prince Edward, Duke of Kent; father; George III>",
        "answer": "George III",
    },
    {
        "question": "Where did the founder of the Ford Motor Company die?",
        "chains": "<Ford Motor Company; founded by; Henry Ford>, "
                  "<Henry Ford; place of death; Dearborn, Michigan>",
        "answer": "Dearborn",
    },
    {
        "question": "When was the spouse of Frida Kahlo born?",
        "chains": "<Frida Kahlo; spouse; Diego Rivera>, "
                  "<Diego Rivera; year of birth; 1886>",
        "answer": "1886",
    },
    {
        "question": "At which university did the author of The Hobbit teach?",
        "chains": "<The Hobbit; written by; J. R. R. Tolkien>, "
                  "<J. R. R. Tolkien; taught at; University of Oxford>",
        "answer": "University of Oxford",
    },
    {
        "question": "Where was the performer of the song Imagine born?",
        "chains": "<Imagine; performed by; John Lennon>, "
                  "<John Lennon; place of birth; Liverpool>",
        "answer": "Liverpool",
    },
    {
        "question": "Who lived longer, Joseph Haydn or Franz Schubert?",
        "chains": "<Joseph Haydn; lifespan; 1732 to 1809>, "
                  "<Franz Schubert; lifespan; 1797 to 1828>",
        "answer": "Joseph Haydn",
    },
    {
        "question": "Who is the mother of the painter of Guernica?",
        "chains": "<Guernica; painted by; Pablo Picasso>, "
                  "<Pablo Picasso; mother; Maria Picasso Lopez>",
        "answer": "Maria Picasso Lopez",
    },
    {
        "question": "Did the director of Metropolis and the director of Modern Times "
                    "share a country of birth?",
        "chains": "<Metropolis; directed by; Fritz Lang>, "
                  "<Fritz Lang; country of birth; Austria>, "
                  "<Modern Times; directed by; Charlie Chaplin>, "
                  "<Charlie Chaplin; country of birth; England>",
        "answer": "no",
    },
]

MUSIQUE_REASONING_CHAIN_EXAMPLARS += [
    {
        "question": "Who founded the company that manufactures the 747 airliner?",
        "chains": "<747; manufactured by; Boeing>, "
                  "<Boeing; founded by; William Boeing>",
        "answer": "William Boeing",
    },
    {
        "question": "What is the capital of the country on whose border with Italy the "
                    "Matterhorn stands?",
        "chains": "<Matterhorn; stands on border of; Switzerland and Italy>, "
                  "<Switzerland; capital; Bern>",
        "answer": "Bern",
    },
    {
        "question": "Into which sea does the river that flows through Cairo empty?",
        "chains": "<Cairo; lies on; Nile>, "
                  "<Nile; empties into; Mediterranean Sea>",
        "answer": "Mediterranean Sea",
    },
    {
        "question": "What currency is used in the country where the Colosseum stands?",
        "chains": "<Colosseum; located in; Rome>, <Rome; country; Italy>, "
                  "<Italy; currency; euro>",
        "answer": "euro",
    },
    {
        "question": "Who wrote the novel on which the film Blade Runner is based?",
        "chains": "<Blade Runner; based on; Do Androids Dream of Electric Sheep?>, "
                  "<Do Androids Dream of Electric Sheep?; written by; Philip K. Dick>",
        "answer": "Philip K. Dick",
    },
    {
        "question": "In which mountain range is the highest peak of the country whose "
                    "capital is Kathmandu?",
        "chains": "<Kathmandu; capital of; Nepal>, "
                  "<Mount Everest; highest peak of; Nepal>, "
                  "<Mount Everest; part of; Himalayas>",
        "answer": "Himalayas",
    },
    {
        "question": "What language is official in the country whose capital hosts the "
                    "Prado Museum?",
        "chains": "<Prado Museum; located in; Madrid>, "
                  "<Madrid; capital of; Spain>, "
                  "<Spain; official language; Spanish>",
        "answer": "Spanish",
    },
    {
        "question": "Who directed the film whose title character is a computer named HAL 9000's "
                    "antagonist aboard Discovery One?",
        "chains": "<HAL 9000; appears in; 2001: A Space Odyssey>, "
                  "<2001: A Space Odyssey; directed by; Stanley Kubrick>",
        "answer": "Stanley Kubrick",
    },
    {
        "question": "On which continent is the desert that contains the Ahaggar Mountains?",
        "chains": "<Ahaggar Mountains; located in; Sahara>, "
                  "<Sahara; located on; Africa>",
        "answer": "Africa",
    },
    {
        "question": "Who succeeded the first president of the country whose largest city "
                    "is Istanbul?",
        "chains": "<Istanbul; largest city of; Turkey>, "
                  "<Mustafa Kemal Ataturk; first president of; Turkey>, "
                  "<Mustafa Kemal Ataturk; succeeded by; Ismet Inonu>",
        "answer": "Ismet Inonu",
    },
    {
        "question": "Which is older, the university where the author of The Hobbit taught "
                    "or the University of Cambridge?",
        "chains": "<The Hobbit; written by; J. R. R. Tolkien>, "
                  "<J. R. R. Tolkien; taught at; University of Oxford>, "
                  "<University of Oxford; teaching since; 1096>, "
                  "<University of Cambridge; founded in; 1209>",
        "answer": "University of Oxford",
    },
    {
        "question": "Which ocean borders the country containing the Atacama Desert?",
        "chains": "<Atacama Desert; located in; Chile>, "
                  "<Chile; borders; Pacific Ocean>",
        "answer": "Pacific Ocean",
    },
    {
        "question": "Who painted the ceiling of the chapel named after Pope Sixtus IV?",
        "chains": "<Sistine Chapel; named after; Pope Sixtus IV>, "
                  "<Sistine Chapel ceiling; painted by; Michelangelo>",
        "answer": "Michelangelo",
    },
    {
        "question": "What is the seat of the county in which the birthplace of Abraham "
                    "Lincoln is located?",
        "chains": "<Abraham Lincoln; born near; Hodgenville>, "
                  "<Hodgenville; located in; LaRue County>, "
                  "<LaRue County; county seat; Hodgenville>",
        "answer": "Hodgenville",
    },
]

HOTPOTQA_TRIPLE_SELECTION_EXAMPLARS += [
    {
        "question": "In which city is the museum housing the raft on which Thor Heyerdahl "
                    "crossed the Pacific in 1947?",
        "triples": [],
        "candidate_triples": [
            "A. <Kon-Tiki; raft of; Thor Heyerdahl>",
            "B. <Eiffel Tower; designed by; Gustave Eiffel>",
            "C. <Taj Mahal; located in; Agra>",
            "D. <Edmund Hillary; climbed with; Tenzing Norgay>",
            "E. <Marie Curie; spouse; Pierre Curie>",
        ],
        "answer": "A",
        "cot_answer": "The question concerns Thor Heyerdahl's raft, so first identify the "
                      "raft. The answer is: A.",
    },
    {
        "question": "In which city is the museum housing the raft on which Thor Heyerdahl "
                    "crossed the Pacific in 1947?",
        "triples": ["<Kon-Tiki; raft of; Thor Heyerdahl>"],
        "candidate_triples": [
            "A. <Kon-Tiki; crossed the Pacific in; 1947>",
            "B. <Kon-Tiki; displayed at; Kon-Tiki Museum>",
            "C. <Neil Armstrong; born in; Wapakoneta, Ohio>",
            "D. <Berlin Wall; erected in; 1961>",
            "E. <Frankenstein; written by; Mary Shelley>",
        ],
        "answer": "B",
        "cot_answer": "With the raft identified, the museum that displays it comes next. "
                      "The answer is: B.",
    },
    {
        "question": "In which city is the museum housing the raft on which Thor Heyerdahl "
                    "crossed the Pacific in 1947?",
        "triples": ["<Kon-Tiki; raft of; Thor Heyerdahl>",
                    "<Kon-Tiki; displayed at; Kon-Tiki Museum>"],
        "candidate_triples": [
            "A. <Kon-Tiki Museum; located in; Oslo>",
            "B. <Kon-Tiki; crossed the Pacific in; 1947>",
            "C. <Sherlock Holmes; created by; Arthur Conan Doyle>",
            "D. <Guglielmo Marconi; shared in 1909; Nobel Prize in Physics>",
            "E. <Tower Bridge; completed in; 1894>",
        ],
        "answer": "A",
        "cot_answer": "The museum is known; its city completes the chain. The answer is: A.",
    },
    {
        "question": "Which element did the first person to win two Nobel Prizes discover "
                    "together with her husband?",
        "triples": [],
        "candidate_triples": [
            "A. <Marie Curie; spouse; Pierre Curie>",
            "B. <Marie Curie; was; first person to win two Nobel Prizes>",
            "C. <Guglielmo Marconi; pioneered; long-distance radio transmission>",
            "D. <Apollo 11; first Moon landing mission; 1969>",
            "E. <Moby-Dick; opens aboard a whaler from; Nantucket>",
        ],
        "answer": "B",
        "cot_answer": "First resolve who won two Nobel Prizes first. The answer is: B.",
    },
    {
        "question": "Which element did the first person to win two Nobel Prizes discover "
                    "together with her husband?",
        "triples": ["<Marie Curie; was; first person to win two Nobel Prizes>"],
        "candidate_triples": [
            "A. <Marie Curie and Pierre Curie; discovered; polonium>",
            "B. <Marie Curie; spouse; Pierre Curie>",
            "C. <Eiffel Tower; completed in; 1889>",
            "D. <Taj Mahal; commissioned by; Shah Jahan>",
            "E. <Edmund Hillary; first ascent of Everest in; 1953>",
        ],
        "answer": "B",
        "cot_answer": "Knowing the laureate is Marie Curie, identify her husband before the "
                      "joint discovery. The answer is: B.",
    },
    {
        "question": "Which element did the first person to win two Nobel Prizes discover "
                    "together with her husband?",
        "triples": ["<Marie Curie; was; first person to win two Nobel Prizes>",
                    "<Marie Curie; spouse; Pierre Curie>"],
        "candidate_triples": [
            "A. <Kon-Tiki Museum; located in; Oslo>",
            "B. <Marie Curie and Pierre Curie; discovered; polonium>",
            "C. <Berlin Wall; fell in; 1989>",
            "D. <Mary Shelley; spouse; Percy Bysshe Shelley>",
            "E. <Neil Armstrong; first person to walk on; the Moon>",
        ],
        "answer": "B",
        "cot_answer": "The couple is established; their joint discovery answers the "
                      "question. The answer is: B.",
    },
    {
        "question": "Was the Eiffel Tower completed before or after Tower Bridge?",
        "triples": ["<Eiffel Tower; completed in; 1889>"],
        "candidate_triples": [
            "A. <Eiffel Tower; designed by; Gustave Eiffel>",
            "B. <Tower Bridge; completed in; 1894>",
            "C. <Taj Mahal; built in memory of; Mumtaz Mahal>",
            "D. <Arthur Conan Doyle; studied medicine in; Edinburgh>",
            "E. <Kon-Tiki; crossed the Pacific in; 1947>",
        ],
        "answer": "B",
        "cot_answer": "A comparison question needs the completion date of BOTH structures; "
                      "Tower Bridge's date is still missing. The answer is: B.",
    },
    {
        "question": "In which Ohio town was the first person to walk on the Moon born?",
        "triples": ["<Neil Armstrong; first person to walk on; the Moon>"],
        "candidate_triples": [
            "A. <Apollo 11; first Moon landing mission; 1969>",
            "B. <Neil Armstrong; born in; Wapakoneta, Ohio>",
            "C. <Edmund Hillary; was; New Zealand mountaineer>",
            "D. <Eiffel Tower; located in; Paris>",
            "E. <Herman Melville; wrote; Moby-Dick>",
        ],
        "answer": "B",
        "cot_answer": "Armstrong is identified; his birthplace answers the question "
                      "directly. The answer is: B.",
    },
]

WIKIMULTIHOPQA_TRIPLE_SELECTION_EXAMPLARS += [
    {
        "question": "Where was the director of Seven Samurai born?",
        "triples": [],
        "candidate_triples": [
            "A. <Akira Kurosawa; place of birth; Tokyo>",
            "B. <Seven Samurai; directed by; Akira Kurosawa>",
            "C. <Metropolis; released in; 1927>",
            "D. <Frida Kahlo; spouse; Diego Rivera>",
            "E. <War and Peace; written by; Leo Tolstoy>",
        ],
        "answer": "B",
        "cot_answer": "The director must be identified before his birthplace. "
                      "The answer is: B.",
    },
    {
        "question": "Where was the director of Seven Samurai born?",
        "triples": ["<Seven Samurai; directed by; Akira Kurosawa>"],
        "candidate_triples": [
            "A. <Akira Kurosawa; place of birth; Tokyo>",
            "B. <Seven Samurai; released in; 1954>",
            "C. <Leo Tolstoy; place of death; Astapovo>",
            "D. <Queen Victoria; father; Prince Edward, Duke of Kent>",
            "E. <Imagine; performed by; John Lennon>",
        ],
        "answer": "A",
        "cot_answer": "Kurosawa is the director; his birthplace completes the chain. "
                      "The answer is: A.",
    },
    {
        "question": "Who was the grandfather of Queen Victoria?",
        "triples": [],
        "candidate_triples": [
            "A. <Prince Edward, Duke of Kent; father; George III>",
            "B. <Queen Victoria; father; Prince Edward, Duke of Kent>",
            "C. <Henry Ford; place of death; Dearborn, Michigan>",
            "D. <The Hobbit; written by; J. R. R. Tolkien>",
            "E. <Salvador Dali; nationality; Spanish>",
        ],
        "answer": "B",
        "cot_answer": "A grandfather question resolves the father first. The answer is: B.",
    },
    {
        "question": "Who was the grandfather of Queen Victoria?",
        "triples": ["<Queen Victoria; father; Prince Edward, Duke of Kent>"],
        "candidate_triples": [
            "A. <Prince Edward, Duke of Kent; father; George III>",
            "B. <Queen Victoria; reigned from; 1837>",
            "C. <Wolfgang Amadeus Mozart; year of death; 1791>",
            "D. <Pablo Picasso; nationality; Spanish>",
            "E. <Ford Motor Company; founded by; Henry Ford>",
        ],
        "answer": "A",
        "cot_answer": "Her father's father is the grandfather asked for. The answer is: A.",
    },
    {
        "question": "Which film was released first, Metropolis or Modern Times?",
        "triples": [],
        "candidate_triples": [
            "A. <Metropolis; released in; 1927>",
            "B. <Metropolis; directed by; Fritz Lang>",
            "C. <Diego Rivera; year of birth; 1886>",
            "D. <John Lennon; place of birth; Liverpool>",
            "E. <Joseph Haydn; lifespan; 1732 to 1809>",
        ],
        "answer": "A",
        "cot_answer": "A release-date comparison needs each film's year; start with "
                      "Metropolis. The answer is: A.",
    },
    {
        "question": "Which film was released first, Metropolis or Modern Times?",
        "triples": ["<Metropolis; released in; 1927>"],
        "candidate_triples": [
            "A. <Modern Times; directed by; Charlie Chaplin>",
            "B. <Modern Times; released in; 1936>",
            "C. <Metropolis; directed by; Fritz Lang>",
            "D. <Franz Schubert; lifespan; 1797 to 1828>",
            "E. <Akira Kurosawa; place of birth; Tokyo>",
        ],
        "answer": "B",
        "cot_answer": "The other film's release year is the missing half of the "
                      "comparison. The answer is: B.",
    },
    {
        "question": "Are Salvador Dali and Pablo Picasso of the same nationality?",
        "triples": ["<Salvador Dali; nationality; Spanish>"],
        "candidate_triples": [
            "A. <Pablo Picasso; mother; Maria Picasso Lopez>",
            "B. <Pablo Picasso; nationality; Spanish>",
            "C. <Guernica; painted by; Pablo Picasso>",
            "D. <Salvador Dali; born in; Figueres>",
            "E. <Fritz Lang; country of birth; Austria>",
        ],
        "answer": "B",
        "cot_answer": "The comparison needs Picasso's nationality to match against "
                      "Dali's. The answer is: B.",
    },
    {
        "question": "When was the spouse of Frida Kahlo born?",
        "triples": ["<Frida Kahlo; spouse; Diego Rivera>"],
        "candidate_triples": [
            "A. <Diego Rivera; year of birth; 1886>",
            "B. <Frida Kahlo; born in; Coyoacan>",
            "C. <Leo Tolstoy; place of death; Astapovo>",
            "D. <Charlie Chaplin; country of birth; England>",
            "E. <Seven Samurai; directed by; Akira Kurosawa>",
        ],
        "answer": "A",
        "cot_answer": "Rivera is the spouse; his birth year is the target. The answer is: A.",
    },
    {
        "question": "At which university did the author of The Hobbit teach?",
        "triples": [],
        "candidate_triples": [
            "A. <J. R. R. Tolkien; taught at; University of Oxford>",
            "B. <The Hobbit; written by; J. R. R. Tolkien>",
            "C. <Imagine; performed by; John Lennon>",
            "D. <The Magic Flute; composed by; Wolfgang Amadeus Mozart>",
            "E. <Henry Ford; place of death; Dearborn, Michigan>",
        ],
        "answer": "B",
        "cot_answer": "Identify the author before where he taught. The answer is: B.",
    },
]

MUSIQUE_TRIPLE_SELECTION_EXAMPLARS += [
    {
        "question": "What currency is used in the country where the Colosseum stands?",
        "triples": [],
        "candidate_triples": [
            "A. <Colosseum; located in; Rome>",
            "B. <Italy; currency; euro>",
            "C. <Matterhorn; stands on border of; Switzerland and Italy>",
            "D. <Nile; empties into; Mediterranean Sea>",
            "E. <Boeing; founded by; William Boeing>",
        ],
        "answer": "A",
        "cot_answer": "Locate the Colosseum first, then climb to the country and its "
                      "currency. The answer is: A.",
    },
    {
        "question": "What currency is used in the country where the Colosseum stands?",
        "triples": ["<Colosseum; located in; Rome>"],
        "candidate_triples": [
            "A. <Rome; country; Italy>",
            "B. <Italy; currency; euro>",
            "C. <Cairo; lies on; Nile>",
            "D. <Madrid; capital of; Spain>",
            "E. <747; manufactured by; Boeing>",
        ],
        "answer": "A",
        "cot_answer": "Rome's country must come before the currency hop. The answer is: A.",
    },
    {
        "question": "What currency is used in the country where the Colosseum stands?",
        "triples": ["<Colosseum; located in; Rome>", "<Rome; country; Italy>"],
        "candidate_triples": [
            "A. <Italy; capital; Rome>",
            "B. <Italy; currency; euro>",
            "C. <Switzerland; capital; Bern>",
            "D. <Sahara; located on; Africa>",
            "E. <Mount Everest; part of; Himalayas>",
        ],
        "answer": "B",
        "cot_answer": "With Italy established, its currency answers the question. "
                      "The answer is: B.",
    },
    {
        "question": "Into which sea does the river that flows through Cairo empty?",
        "triples": [],
        "candidate_triples": [
            "A. <Nile; empties into; Mediterranean Sea>",
            "B. <Cairo; lies on; Nile>",
            "C. <Atacama Desert; located in; Chile>",
            "D. <Istanbul; largest city of; Turkey>",
            "E. <Blade Runner; based on; Do Androids Dream of Electric Sheep?>",
        ],
        "answer": "B",
        "cot_answer": "First identify Cairo's river, then where it ends. The answer is: B.",
    },
    {
        "question": "Into which sea does the river that flows through Cairo empty?",
        "triples": ["<Cairo; lies on; Nile>"],
        "candidate_triples": [
            "A. <Nile; empties into; Mediterranean Sea>",
            "B. <Nile; flows through; eleven countries>",
            "C. <Chile; borders; Pacific Ocean>",
            "D. <Kathmandu; capital of; Nepal>",
            "E. <Sistine Chapel; named after; Pope Sixtus IV>",
        ],
        "answer": "A",
        "cot_answer": "The Nile is the river; its mouth completes the chain. "
                      "The answer is: A.",
    },
    {
        "question": "Who succeeded the first president of the country whose largest city "
                    "is Istanbul?",
        "triples": [],
        "candidate_triples": [
            "A. <Mustafa Kemal Ataturk; first president of; Turkey>",
            "B. <Istanbul; largest city of; Turkey>",
            "C. <Rome; country; Italy>",
            "D. <Michelangelo; painted; Sistine Chapel ceiling>",
            "E. <Boeing; founded by; William Boeing>",
        ],
        "answer": "B",
        "cot_answer": "Resolve the country from its largest city before its first "
                      "president. The answer is: B.",
    },
    {
        "question": "Who succeeded the first president of the country whose largest city "
                    "is Istanbul?",
        "triples": ["<Istanbul; largest city of; Turkey>"],
        "candidate_triples": [
            "A. <Mustafa Kemal Ataturk; succeeded by; Ismet Inonu>",
            "B. <Mustafa Kemal Ataturk; first president of; Turkey>",
            "C. <Switzerland; capital; Bern>",
            "D. <Hodgenville; located in; LaRue County>",
            "E. <Prado Museum; located in; Madrid>",
        ],
        "answer": "B",
        "cot_answer": "Turkey is known; its first president is the next hop. "
                      "The answer is: B.",
    },
    {
        "question": "Who succeeded the first president of the country whose largest city "
                    "is Istanbul?",
        "triples": ["<Istanbul; largest city of; Turkey>",
                    "<Mustafa Kemal Ataturk; first president of; Turkey>"],
        "candidate_triples": [
            "A. <Mustafa Kemal Ataturk; succeeded by; Ismet Inonu>",
            "B. <Mustafa Kemal Ataturk; died in; 1938>",
            "C. <Abraham Lincoln; born near; Hodgenville>",
            "D. <2001: A Space Odyssey; directed by; Stanley Kubrick>",
            "E. <Spain; official language; Spanish>",
        ],
        "answer": "A",
        "cot_answer": "Ataturk's successor is exactly what the question asks. "
                      "The answer is: A.",
    },
    {
        "question": "Who painted the ceiling of the chapel named after Pope Sixtus IV?",
        "triples": ["<Sistine Chapel; named after; Pope Sixtus IV>"],
        "candidate_triples": [
            "A. <Sistine Chapel ceiling; painted by; Michelangelo>",
            "B. <Sistine Chapel; located in; Vatican City>",
            "C. <Do Androids Dream of Electric Sheep?; written by; Philip K. Dick>",
            "D. <Ahaggar Mountains; located in; Sahara>",
            "E. <Italy; currency; euro>",
        ],
        "answer": "A",
        "cot_answer": "The chapel is identified; the ceiling's painter is the final hop. "
                      "The answer is: A.",
    },
]
