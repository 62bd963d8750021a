"""Few-shot demonstrations for knowledge-triple extraction.

Original demonstration data (same SCHEMA as the reference's
`prompts/kg_construction/*_demonstrations.py` — records of
``{"title", "text", "triples"}`` — but independently authored documents).
Users can extend or replace these lists, or pass ``examplars=`` to
:class:`kirag_tpu.kg.KGGenerator` to load their own.
"""

HOTPOTQA_EXAMPLARS = [
    {
        "title": "Edison Bridge",
        "text": "The Edison Bridge is a through arch bridge over the Raritan River in New "
                "Jersey. It was completed in 1931 and named after the inventor Thomas Edison, "
                "who maintained a laboratory in nearby Menlo Park.",
        "triples": "<Edison Bridge; is a; through arch bridge> <Edison Bridge; crosses; Raritan River> "
                   "<Edison Bridge; located in; New Jersey> <Edison Bridge; completed in; 1931> "
                   "<Edison Bridge; named after; Thomas Edison> <Thomas Edison; maintained a laboratory in; Menlo Park>",
    },
    {
        "title": "Mira Nair",
        "text": "Mira Nair is an Indian-American filmmaker born in Rourkela, Odisha. Her debut "
                "feature film Salaam Bombay! won the Camera d'Or at the 1988 Cannes Film Festival.",
        "triples": "<Mira Nair; is; Indian-American filmmaker> <Mira Nair; born in; Rourkela, Odisha> "
                   "<Salaam Bombay!; debut feature film of; Mira Nair> "
                   "<Salaam Bombay!; won; Camera d'Or> <Camera d'Or; awarded at; 1988 Cannes Film Festival>",
    },
    {
        "title": "Operation Paperclip",
        "text": "Operation Paperclip was a secret United States intelligence program that brought "
                "more than 1,600 German scientists to America after World War II. Wernher von Braun, "
                "who later led the development of the Saturn V rocket, was among them.",
        "triples": "<Operation Paperclip; was; secret United States intelligence program> "
                   "<Operation Paperclip; brought to America; more than 1,600 German scientists> "
                   "<Operation Paperclip; occurred after; World War II> "
                   "<Wernher von Braun; participant of; Operation Paperclip> "
                   "<Wernher von Braun; led the development of; Saturn V rocket>",
    },
    {
        "title": "Lake Baikal",
        "text": "Lake Baikal is a rift lake in southern Siberia, Russia. It is the deepest lake "
                "in the world, reaching 1,642 metres, and holds about one fifth of the world's "
                "unfrozen fresh water.",
        "triples": "<Lake Baikal; is a; rift lake> <Lake Baikal; located in; southern Siberia, Russia> "
                   "<Lake Baikal; is; deepest lake in the world> <Lake Baikal; depth; 1,642 metres> "
                   "<Lake Baikal; holds; one fifth of the world's unfrozen fresh water>",
    },
    {
        "title": "The Velvet Underground",
        "text": "The Velvet Underground was an American rock band formed in New York City in 1964. "
                "The band was managed by Andy Warhol, who also designed the cover of their debut "
                "album The Velvet Underground & Nico.",
        "triples": "<The Velvet Underground; was; American rock band> "
                   "<The Velvet Underground; formed in; New York City> "
                   "<The Velvet Underground; formed in; 1964> "
                   "<The Velvet Underground; managed by; Andy Warhol> "
                   "<Andy Warhol; designed the cover of; The Velvet Underground & Nico>",
    },
]

WIKIMULTIHOPQA_EXAMPLARS = [
    {
        "title": "Margaret of Anjou",
        "text": "Margaret of Anjou was Queen of England from 1445 to 1461 by marriage to King "
                "Henry VI. She was the daughter of Rene, King of Naples.",
        "triples": "<Margaret of Anjou; was; Queen of England> "
                   "<Margaret of Anjou; reign; 1445 to 1461> "
                   "<Margaret of Anjou; spouse; Henry VI> "
                   "<Margaret of Anjou; father; Rene, King of Naples>",
    },
    {
        "title": "A Trip to the Moon",
        "text": "A Trip to the Moon is a 1902 French science fiction film directed by Georges "
                "Melies. Melies died in Paris in 1938.",
        "triples": "<A Trip to the Moon; is a; 1902 French science fiction film> "
                   "<A Trip to the Moon; directed by; Georges Melies> "
                   "<Georges Melies; place of death; Paris> <Georges Melies; year of death; 1938>",
    },
    {
        "title": "Hans Zimmer",
        "text": "Hans Zimmer is a German film composer born in Frankfurt in 1957. He composed the "
                "score for the film Inception, directed by Christopher Nolan.",
        "triples": "<Hans Zimmer; is; German film composer> <Hans Zimmer; born in; Frankfurt> "
                   "<Hans Zimmer; year of birth; 1957> <Hans Zimmer; composed the score for; Inception> "
                   "<Inception; directed by; Christopher Nolan>",
    },
    {
        "title": "Tughlaqabad Fort",
        "text": "Tughlaqabad Fort is a ruined fort in Delhi, built by Ghiyas-ud-din Tughlaq, the "
                "founder of the Tughlaq dynasty, in 1321.",
        "triples": "<Tughlaqabad Fort; is a; ruined fort> <Tughlaqabad Fort; located in; Delhi> "
                   "<Tughlaqabad Fort; built by; Ghiyas-ud-din Tughlaq> "
                   "<Ghiyas-ud-din Tughlaq; founder of; Tughlaq dynasty> "
                   "<Tughlaqabad Fort; built in; 1321>",
    },
    {
        "title": "Clara Schumann",
        "text": "Clara Schumann was a German pianist and composer. She was married to the composer "
                "Robert Schumann, whom she met through her father Friedrich Wieck, her piano teacher.",
        "triples": "<Clara Schumann; was; German pianist and composer> "
                   "<Clara Schumann; spouse; Robert Schumann> "
                   "<Clara Schumann; father; Friedrich Wieck> "
                   "<Friedrich Wieck; was piano teacher of; Clara Schumann>",
    },
]

MUSIQUE_EXAMPLARS = [
    {
        "title": "Port of Rotterdam",
        "text": "The Port of Rotterdam is the largest seaport in Europe, located in the city of "
                "Rotterdam in the province of South Holland, Netherlands.",
        "triples": "<Port of Rotterdam; is; largest seaport in Europe> "
                   "<Port of Rotterdam; located in; Rotterdam> "
                   "<Rotterdam; located in province; South Holland> "
                   "<South Holland; country; Netherlands>",
    },
    {
        "title": "Kiri Te Kanawa",
        "text": "Kiri Te Kanawa is a New Zealand soprano. She performed at the 1981 wedding of "
                "Prince Charles and Lady Diana Spencer at St Paul's Cathedral in London.",
        "triples": "<Kiri Te Kanawa; is; New Zealand soprano> "
                   "<Kiri Te Kanawa; performed at; wedding of Prince Charles and Lady Diana Spencer> "
                   "<wedding of Prince Charles and Lady Diana Spencer; held at; St Paul's Cathedral> "
                   "<St Paul's Cathedral; located in; London> "
                   "<wedding of Prince Charles and Lady Diana Spencer; year; 1981>",
    },
    {
        "title": "Mount Kosciuszko",
        "text": "Mount Kosciuszko is the highest mountain in mainland Australia. It lies in the "
                "Snowy Mountains range within Kosciuszko National Park in New South Wales.",
        "triples": "<Mount Kosciuszko; is; highest mountain in mainland Australia> "
                   "<Mount Kosciuszko; part of range; Snowy Mountains> "
                   "<Mount Kosciuszko; within; Kosciuszko National Park> "
                   "<Kosciuszko National Park; located in; New South Wales>",
    },
    {
        "title": "Radiohead",
        "text": "Radiohead are an English rock band from Abingdon, Oxfordshire, formed in 1985. "
                "Their third album OK Computer was produced with Nigel Godrich.",
        "triples": "<Radiohead; are; English rock band> <Radiohead; from; Abingdon, Oxfordshire> "
                   "<Radiohead; formed in; 1985> <OK Computer; third album of; Radiohead> "
                   "<OK Computer; produced with; Nigel Godrich>",
    },
]

WIKIPEDIA_EXAMPLARS = [
    {
        "title": "Photosynthesis",
        "text": "Photosynthesis is the process by which green plants convert light energy into "
                "chemical energy. It takes place in chloroplasts and produces oxygen as a byproduct.",
        "triples": "<Photosynthesis; is; process converting light energy into chemical energy> "
                   "<Photosynthesis; performed by; green plants> "
                   "<Photosynthesis; takes place in; chloroplasts> "
                   "<Photosynthesis; produces as byproduct; oxygen>",
    },
    {
        "title": "Alan Turing",
        "text": "Alan Turing was an English mathematician and computer scientist born in London "
                "in 1912. He worked at Bletchley Park during World War II and formulated the "
                "concept of the Turing machine.",
        "triples": "<Alan Turing; was; English mathematician and computer scientist> "
                   "<Alan Turing; born in; London> <Alan Turing; year of birth; 1912> "
                   "<Alan Turing; worked at; Bletchley Park> "
                   "<Alan Turing; formulated; Turing machine>",
    },
    {
        "title": "Danube",
        "text": "The Danube is Europe's second-longest river. It originates in the Black Forest "
                "in Germany and flows into the Black Sea through the Danube Delta.",
        "triples": "<Danube; is; Europe's second-longest river> "
                   "<Danube; originates in; Black Forest> <Black Forest; located in; Germany> "
                   "<Danube; flows into; Black Sea> <Danube; mouth; Danube Delta>",
    },
    {
        "title": "Penicillin",
        "text": "Penicillin is a group of antibiotics derived from Penicillium moulds. It was "
                "discovered by Alexander Fleming in 1928 at St Mary's Hospital in London.",
        "triples": "<Penicillin; is; group of antibiotics> "
                   "<Penicillin; derived from; Penicillium moulds> "
                   "<Penicillin; discovered by; Alexander Fleming> "
                   "<Penicillin; discovered in; 1928> "
                   "<Alexander Fleming; worked at; St Mary's Hospital, London>",
    },
]

HOTPOTQA_EXAMPLARS += [
    {
        "title": "Golden Gate Bridge",
        "text": "The Golden Gate Bridge is a suspension bridge spanning the Golden Gate "
                "strait between San Francisco and Marin County. Its chief engineer was "
                "Joseph Strauss, and it opened to traffic in 1937.",
        "triples": "<Golden Gate Bridge; is a; suspension bridge> "
                   "<Golden Gate Bridge; spans; Golden Gate strait> "
                   "<Golden Gate Bridge; connects; San Francisco and Marin County> "
                   "<Golden Gate Bridge; chief engineer; Joseph Strauss> "
                   "<Golden Gate Bridge; opened in; 1937>",
    },
    {
        "title": "Toni Morrison",
        "text": "Toni Morrison was an American novelist who won the Nobel Prize in "
                "Literature in 1993. Her novel Beloved won the Pulitzer Prize for "
                "Fiction and was adapted into a 1998 film starring Oprah Winfrey.",
        "triples": "<Toni Morrison; was; American novelist> "
                   "<Toni Morrison; won; Nobel Prize in Literature> "
                   "<Toni Morrison; Nobel Prize year; 1993> "
                   "<Beloved; written by; Toni Morrison> "
                   "<Beloved; won; Pulitzer Prize for Fiction> "
                   "<Beloved; adapted into film in; 1998> "
                   "<Beloved (1998 film); starring; Oprah Winfrey>",
    },
    {
        "title": "CERN",
        "text": "CERN is a European research organization that operates the Large Hadron "
                "Collider, the world's largest particle accelerator, near Geneva on the "
                "France-Switzerland border. The World Wide Web was invented at CERN by "
                "Tim Berners-Lee in 1989.",
        "triples": "<CERN; is; European research organization> "
                   "<CERN; operates; Large Hadron Collider> "
                   "<Large Hadron Collider; is; world's largest particle accelerator> "
                   "<CERN; located near; Geneva> "
                   "<World Wide Web; invented at; CERN> "
                   "<World Wide Web; invented by; Tim Berners-Lee> "
                   "<World Wide Web; invented in; 1989>",
    },
]

WIKIMULTIHOPQA_EXAMPLARS += [
    {
        "title": "Ada Lovelace",
        "text": "Ada Lovelace was an English mathematician, the daughter of the poet "
                "Lord Byron. She worked with Charles Babbage on the Analytical Engine.",
        "triples": "<Ada Lovelace; was; English mathematician> "
                   "<Ada Lovelace; father; Lord Byron> <Lord Byron; was; poet> "
                   "<Ada Lovelace; worked with; Charles Babbage> "
                   "<Charles Babbage; designed; Analytical Engine>",
    },
    {
        "title": "Spirited Away",
        "text": "Spirited Away is a 2001 animated film directed by Hayao Miyazaki and "
                "produced by Studio Ghibli. It won the Academy Award for Best Animated "
                "Feature in 2003.",
        "triples": "<Spirited Away; is a; 2001 animated film> "
                   "<Spirited Away; directed by; Hayao Miyazaki> "
                   "<Spirited Away; produced by; Studio Ghibli> "
                   "<Spirited Away; won; Academy Award for Best Animated Feature> "
                   "<Spirited Away; Academy Award year; 2003>",
    },
    {
        "title": "Suez Canal",
        "text": "The Suez Canal is an artificial waterway in Egypt connecting the "
                "Mediterranean Sea to the Red Sea. It was opened in 1869 under the "
                "direction of Ferdinand de Lesseps.",
        "triples": "<Suez Canal; is; artificial waterway> <Suez Canal; located in; Egypt> "
                   "<Suez Canal; connects; Mediterranean Sea and Red Sea> "
                   "<Suez Canal; opened in; 1869> "
                   "<Suez Canal; directed by; Ferdinand de Lesseps>",
    },
]

MUSIQUE_EXAMPLARS += [
    {
        "title": "Machu Picchu",
        "text": "Machu Picchu is a 15th-century Inca citadel in the Cusco Region of "
                "Peru, situated above the Sacred Valley. It was brought to international "
                "attention by Hiram Bingham in 1911.",
        "triples": "<Machu Picchu; is; 15th-century Inca citadel> "
                   "<Machu Picchu; located in; Cusco Region> <Cusco Region; country; Peru> "
                   "<Machu Picchu; situated above; Sacred Valley> "
                   "<Machu Picchu; publicized by; Hiram Bingham> "
                   "<Machu Picchu; publicized in; 1911>",
    },
    {
        "title": "BBC",
        "text": "The British Broadcasting Corporation is headquartered at Broadcasting "
                "House in the City of Westminster, London. It was founded in 1922 and "
                "its first director-general was John Reith.",
        "triples": "<British Broadcasting Corporation; headquartered at; Broadcasting House> "
                   "<Broadcasting House; located in; City of Westminster> "
                   "<City of Westminster; part of; London> "
                   "<British Broadcasting Corporation; founded in; 1922> "
                   "<British Broadcasting Corporation; first director-general; John Reith>",
    },
]

WIKIPEDIA_EXAMPLARS += [
    {
        "title": "Haber process",
        "text": "The Haber process produces ammonia from nitrogen and hydrogen using an "
                "iron catalyst. It was developed by Fritz Haber and scaled industrially "
                "by Carl Bosch at BASF.",
        "triples": "<Haber process; produces; ammonia> "
                   "<Haber process; inputs; nitrogen and hydrogen> "
                   "<Haber process; uses catalyst; iron> "
                   "<Haber process; developed by; Fritz Haber> "
                   "<Haber process; industrialized by; Carl Bosch> "
                   "<Carl Bosch; worked at; BASF>",
    },
    {
        "title": "Great Barrier Reef",
        "text": "The Great Barrier Reef is the world's largest coral reef system, "
                "located in the Coral Sea off the coast of Queensland, Australia. It was "
                "designated a World Heritage Site in 1981.",
        "triples": "<Great Barrier Reef; is; world's largest coral reef system> "
                   "<Great Barrier Reef; located in; Coral Sea> "
                   "<Great Barrier Reef; off the coast of; Queensland, Australia> "
                   "<Great Barrier Reef; designated World Heritage Site in; 1981>",
    },
]
